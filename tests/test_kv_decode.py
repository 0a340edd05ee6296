"""KV-cached greedy decode (eval/kv_decode.py) — the cached engine must
reproduce the full-recompute generator (eval/vl_eval.greedy_generate)
exactly: same buffer protocol, same tokens, for mixed-length prompts,
multi-image (few-shot) media, and qk_ln configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.kv_decode import (greedy_generate_cached,
                                         supports_kv_cache)
from deer_vla_tpu.eval.vl_eval import greedy_generate
from deer_vla_tpu.models.flamingo import init_deer


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=64)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params, tok


def _prompts(tok, texts):
    ids, mask = tok(texts)
    # strip the trailing <eoc><eos> per row (generation continues the
    # prompt) — the same protocol the eval models use
    ids = np.array(ids, copy=True)
    mask = np.array(mask, copy=True)
    for r, length in enumerate(mask.sum(-1)):
        le = int(length)
        ids[r, le - 2:le] = 0
        mask[r, le - 2:le] = 0
    return ids[:, :-2], mask[:, :-2]


def test_cached_matches_recompute_tokens(setup):
    cfg, params, tok = setup
    r = np.random.RandomState(0)
    hw = cfg.vit.image_size
    vision = jnp.asarray(r.randn(3, 1, 1, 3, hw, hw), jnp.float32)
    ids, mask = _prompts(tok, ["a photo of", "what is the small red object",
                               "hi"])
    out_a = greedy_generate(params, cfg, vision, ids, mask,
                            max_new_tokens=6, eos_id=tok.eos_token_id)
    out_b = greedy_generate_cached(params, cfg, vision, ids, mask,
                                   max_new_tokens=6,
                                   eos_id=tok.eos_token_id)
    np.testing.assert_array_equal(out_a, out_b)


def test_cached_matches_recompute_multi_image(setup):
    """Few-shot geometry: 3 <image> markers per row, (B, 3) media."""
    cfg, params, tok = setup
    r = np.random.RandomState(1)
    hw = cfg.vit.image_size
    vision = jnp.asarray(r.randn(2, 3, 1, 3, hw, hw), jnp.float32)
    texts = ["<image>A photo of a cat<|endofchunk|><image>A photo of a dog"
             "<|endofchunk|><image>A photo of ",
             "<image>one<|endofchunk|><image>two<|endofchunk|><image>"
             "A photo of "]
    ids, mask = tok.encode_raw(texts, 40)
    # drop the trailing eos encode_raw appends
    ids = np.array(ids, copy=True)
    mask = np.array(mask, copy=True)
    for r_i, length in enumerate(mask.sum(-1)):
        le = int(length)
        ids[r_i, le - 1] = tok.pad_token_id
        mask[r_i, le - 1] = 0
    out_a = greedy_generate(params, cfg, vision, ids, mask, max_new_tokens=5)
    out_b = greedy_generate_cached(params, cfg, vision, ids, mask,
                                   max_new_tokens=5)
    np.testing.assert_array_equal(out_a, out_b)


def test_cached_single_new_token(setup):
    cfg, params, tok = setup
    r = np.random.RandomState(2)
    hw = cfg.vit.image_size
    vision = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids, mask = _prompts(tok, ["a photo of"])
    out_a = greedy_generate(params, cfg, vision, ids, mask, max_new_tokens=1)
    out_b = greedy_generate_cached(params, cfg, vision, ids, mask,
                                   max_new_tokens=1)
    np.testing.assert_array_equal(out_a, out_b)


def test_supports_kv_cache_gates_llama():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    cfg = deer_tiny()
    assert supports_kv_cache(cfg)
    llama = dataclasses.replace(
        cfg, mpt=dataclasses.replace(cfg.mpt, arch="llama"))
    assert not supports_kv_cache(llama)


def test_auto_engine_switches_on_prompt_length(setup, monkeypatch):
    """decode_engine='auto' (the harness default): short prompts stay on
    the full-recompute generator, long few-shot buffers route through the
    KV cache (reference open_flamingo.py generates with use_cache=True)."""
    from deer_vla_tpu.eval import eval_models
    from deer_vla_tpu.eval import kv_decode as kvmod
    from deer_vla_tpu.eval import vl_eval as vlmod

    cfg, params, tok = setup
    model = eval_models.FlamingoEvalModel(cfg, params, tok)
    assert model.decode_engine == "auto"
    used = []

    def fake_cached(*a, **kw):
        used.append("kv_cache")
        return np.zeros((1, 4), np.int32)

    def fake_recompute(*a, **kw):
        used.append("recompute")
        return np.zeros((1, 4), np.int32)

    monkeypatch.setattr(kvmod, "greedy_generate_cached", fake_cached)
    monkeypatch.setattr(vlmod, "greedy_generate", fake_recompute)
    vision = np.zeros((1, 1, 1, 3, cfg.vit.image_size, cfg.vit.image_size),
                      np.float32)
    model.get_outputs(vision, ["a b"], max_new_tokens=4)
    long_prompt = "<image>" + " word" * 150 + " answer:"
    model.get_outputs(vision, [long_prompt], max_new_tokens=4, raw=True)
    assert used == ["recompute", "kv_cache"], used
