"""BLIP eval-model family: numerical parity vs a randomly-initialised HF
torch BlipForConditionalGeneration replica (the artifact-free parity
pattern of test_full_parity_torch.py), converter key coverage, and greedy
generation agreement.

Reference capability: open_flamingo/eval/models/blip.py (the upstream
harness's alternative eval model, a torch/HF shell); here the model itself
is TPU-native (models/blip.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from deer_vla_tpu.models.blip import (blip_forward, blip_generate, blip_tiny,
                                      convert_hf_blip, init_blip,
                                      text_decoder_forward, vision_forward)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import (BlipConfig, BlipForConditionalGeneration,
                              BlipTextConfig, BlipVisionConfig)
    cfg = blip_tiny()
    vc = BlipVisionConfig(hidden_size=cfg.vision.width,
                          intermediate_size=cfg.vision.mlp_dim,
                          num_hidden_layers=cfg.vision.layers,
                          num_attention_heads=cfg.vision.heads,
                          image_size=cfg.vision.image_size,
                          patch_size=cfg.vision.patch_size)
    tc = BlipTextConfig(hidden_size=cfg.text.width,
                        intermediate_size=cfg.text.mlp_dim,
                        num_hidden_layers=cfg.text.layers,
                        num_attention_heads=cfg.text.heads,
                        encoder_hidden_size=cfg.vision.width,
                        vocab_size=cfg.text.vocab_size,
                        max_position_embeddings=cfg.text.max_positions,
                        bos_token_id=cfg.text.bos_token_id,
                        sep_token_id=cfg.text.sep_token_id,
                        pad_token_id=cfg.text.pad_token_id)
    torch.manual_seed(0)
    hf = BlipForConditionalGeneration(
        BlipConfig(text_config=tc.to_dict(), vision_config=vc.to_dict()))
    hf.eval()
    params = convert_hf_blip(hf.state_dict(), cfg)
    return hf, params, cfg


def _rand_inputs(cfg, b=2, s=7, seed=0):
    r = np.random.RandomState(seed)
    pix = r.randn(b, 3, cfg.vision.image_size,
                  cfg.vision.image_size).astype(np.float32)
    ids = r.randint(3, cfg.text.vocab_size - 4, (b, s)).astype(np.int32)
    ids[:, 0] = cfg.text.bos_token_id
    mask = np.ones((b, s), np.int32)
    mask[1, -2:] = 0  # ragged row exercises the key-padding mask
    ids[1, -2:] = cfg.text.pad_token_id
    return pix, ids, mask


def test_converter_consumes_every_key(hf_pair):
    # convert_hf_blip asserts zero unconsumed keys internally; a changed HF
    # naming scheme or a missing consumer fails loudly at fixture build.
    hf, params, cfg = hf_pair
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_hf = len([k for k in hf.state_dict() if not k.endswith("position_ids")])
    # cls.predictions.bias and cls.predictions.decoder.bias are tied aliases
    # in HF — both consumed, stored once
    assert n_leaves == n_hf - 1


def test_vision_parity(hf_pair):
    hf, params, cfg = hf_pair
    pix, _, _ = _rand_inputs(cfg)
    with torch.no_grad():
        ref = hf.vision_model(torch.from_numpy(pix)).last_hidden_state.numpy()
    out = np.asarray(vision_forward(params, jnp.asarray(pix), cfg.vision))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_text_decoder_parity(hf_pair):
    hf, params, cfg = hf_pair
    pix, ids, mask = _rand_inputs(cfg)
    with torch.no_grad():
        enc = hf.vision_model(torch.from_numpy(pix)).last_hidden_state
        ref = hf.text_decoder(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            encoder_hidden_states=enc).logits.numpy()
    enc_j = vision_forward(params, jnp.asarray(pix), cfg.vision)
    out = np.asarray(text_decoder_forward(params, jnp.asarray(ids),
                                          jnp.asarray(mask), enc_j, cfg.text))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_full_forward_parity(hf_pair):
    hf, params, cfg = hf_pair
    pix, ids, mask = _rand_inputs(cfg, seed=1)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(pix),
                 input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64))
                 ).logits.numpy()
    out = np.asarray(blip_forward(params, jnp.asarray(pix), jnp.asarray(ids),
                                  jnp.asarray(mask), cfg))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_greedy_generate_matches_hf(hf_pair):
    hf, params, cfg = hf_pair
    pix, _, _ = _rand_inputs(cfg, b=2, seed=2)
    bos = cfg.text.bos_token_id
    prompt = np.full((2, 1), bos, np.int32)
    pmask = np.ones((2, 1), np.int32)
    n_new = 6
    with torch.no_grad():
        # HF's BlipForConditionalGeneration.generate strips the LAST prompt
        # token (modeling_blip.py `input_ids[:, :-1]`), so its effective
        # prompt for [[bos, eos]] is [bos] — matching our [[bos]]
        hf_prompt = np.concatenate(
            [prompt, np.full((2, 1), cfg.text.sep_token_id, np.int32)], 1)
        ref = hf.generate(pixel_values=torch.from_numpy(pix),
                          input_ids=torch.from_numpy(
                              hf_prompt.astype(np.int64)),
                          max_new_tokens=n_new, min_new_tokens=n_new,
                          num_beams=1, do_sample=False).numpy()
    out = blip_generate(params, cfg, jnp.asarray(pix), prompt, pmask,
                        max_new_tokens=n_new)
    # HF returns [bos, tok1..tokN]; ours returns the N generated ids.
    # HF may stop at SEP before min_new under eos handling; compare the
    # prefix up to the first SEP in the HF row.
    for r in range(2):
        hf_row = ref[r, 1:]
        sep = np.where(hf_row == cfg.text.sep_token_id)[0]
        upto = int(sep[0]) + 1 if len(sep) else len(hf_row)
        np.testing.assert_array_equal(out[r, :upto], hf_row[:upto])


def test_generate_ragged_prompts(hf_pair):
    """Rows with different prompt lengths decode from their own cursor
    (the static-buffer protocol shared with vl_eval.greedy_generate)."""
    hf, params, cfg = hf_pair
    pix, _, _ = _rand_inputs(cfg, b=2, seed=3)
    bos, pad = cfg.text.bos_token_id, cfg.text.pad_token_id
    prompt = np.full((2, 3), pad, np.int32)
    pmask = np.zeros((2, 3), np.int32)
    prompt[0, 0], pmask[0, 0] = bos, 1
    prompt[1, :3] = [bos, 5, 9]
    pmask[1, :3] = 1
    out = blip_generate(params, cfg, jnp.asarray(pix), prompt, pmask,
                        max_new_tokens=4)
    for r, plen in ((0, 1), (1, 3)):
        with torch.no_grad():
            # append a dummy token for HF's `input_ids[:, :-1]` strip
            hf_prompt = np.concatenate(
                [prompt[r:r + 1, :plen],
                 [[cfg.text.sep_token_id]]], 1).astype(np.int64)
            ref = hf.generate(
                pixel_values=torch.from_numpy(pix[r:r + 1]),
                input_ids=torch.from_numpy(hf_prompt),
                max_new_tokens=4, min_new_tokens=4, num_beams=1,
                do_sample=False).numpy()[0, plen:]
        sep = np.where(ref == cfg.text.sep_token_id)[0]
        upto = int(sep[0]) + 1 if len(sep) else len(ref)
        np.testing.assert_array_equal(out[r, :upto], ref[:upto])
