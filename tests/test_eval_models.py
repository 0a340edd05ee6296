"""Pluggable VL eval-model seam (eval/eval_models.py) — the upstream
harness's BaseEvalModel + --model selection (open_flamingo/eval/
eval_model.py:8, evaluate.py:398-400) rebuilt TPU-native.

Covers: factory routing, both families end-to-end through the real
cli.vl_eval benchmark driver (caption + VQA + classify + RICES), the
BLIP hash tokenizer contract, and rank-classification scoring."""

import json

import numpy as np
import pytest


def _args(**kw):
    from deer_vla_tpu.cli.vl_eval import build_parser
    argv = []
    for k, v in kw.items():
        if isinstance(v, bool):
            if v:
                argv.append(f"--{k}")
        else:
            argv += [f"--{k}", str(v)]
    return build_parser().parse_args(argv)


def test_factory_routes_families():
    from deer_vla_tpu.eval.eval_models import (BlipEvalModel,
                                               FlamingoEvalModel,
                                               make_eval_model)
    m = make_eval_model(_args(model="tiny", eval_model="blip", debug=True))
    assert isinstance(m, BlipEvalModel) and m.name == "blip"
    f = make_eval_model(_args(model="tiny", eval_model="flamingo",
                              debug=True))
    assert isinstance(f, FlamingoEvalModel) and f.name == "flamingo"


def test_blip_hash_tokenizer_contract():
    from deer_vla_tpu.eval.eval_models import BlipHashTokenizer
    from deer_vla_tpu.models.blip import blip_tiny
    cfg = blip_tiny()
    tok = BlipHashTokenizer(cfg.text.vocab_size, cfg.text.bos_token_id,
                            cfg.text.sep_token_id, cfg.text.pad_token_id)
    ids, mask = tok(["a photo of", "hi"])
    assert ids.shape == mask.shape
    assert (ids[:, 0] == cfg.text.bos_token_id).all()  # [DEC]-prefixed rows
    assert mask[0].sum() == 4 and mask[1].sum() == 2
    # hash ids never collide with the specials
    body = ids[mask > 0]
    assert not np.isin(body[body != cfg.text.bos_token_id],
                       [cfg.text.sep_token_id, cfg.text.pad_token_id]).any()
    # deterministic + decodable
    ids2, _ = tok(["a photo of"])
    assert (ids2[0] == ids[0, :4]).all()
    assert tok.decode([5, cfg.text.bos_token_id, 7]) == "5 7"


@pytest.mark.parametrize("eval_model", ["flamingo", "blip"])
def test_blip_and_flamingo_through_caption_cli(eval_model, capsys):
    from deer_vla_tpu.cli.vl_eval import main
    res = main(["--task", "caption", "--debug", "--model", "tiny",
                "--eval_model", eval_model, "--num_samples", "8",
                "--batch_size", "4", "--max_new_tokens", "4"])
    assert res["task"] == "caption" and res["n"] == 8
    assert 0.0 <= res["score"] <= 1.0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["metric"] == "bleu1"


def test_blip_vqa_with_rices_and_predictions(tmp_path):
    from deer_vla_tpu.cli.vl_eval import main
    pred_p = str(tmp_path / "preds.json")
    res = main(["--task", "vqa", "--debug", "--model", "tiny",
                "--eval_model", "blip", "--num_samples", "8",
                "--batch_size", "4", "--max_new_tokens", "4",
                "--rices", "--shots", "2",
                "--save_predictions", pred_p])
    assert res["metric"] == "vqa_acc"
    assert len(res["rices_example"]) == 2
    preds = json.load(open(pred_p))
    assert len(preds) == 8 and set(preds[0]) == {"answer", "question_id"}


def test_blip_classify_cli():
    from deer_vla_tpu.cli.vl_eval import main
    res = main(["--task", "classify", "--debug", "--model", "tiny",
                "--eval_model", "blip", "--num_samples", "6"])
    assert res["metric"] == "top1_acc" and res["n"] == 6
    assert 0.0 <= res["score"] <= 1.0


def test_blip_embed_images_shape_and_norm():
    from deer_vla_tpu.eval.eval_models import make_eval_model
    m = make_eval_model(_args(model="tiny", eval_model="blip", debug=True))
    r = np.random.RandomState(0)
    feats = m.embed_images(r.randint(0, 256, (3, 16, 16, 3), np.uint8))
    assert feats.shape == (3, m.cfg.vision.width)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-4)


def test_roc_auc_rank_statistic():
    from deer_vla_tpu.eval.vl_eval import roc_auc
    # perfect separation, inverse, ties, degenerate
    assert roc_auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert roc_auc([1, 1, 0, 0], [0.1, 0.2, 0.8, 0.9]) == 0.0
    assert roc_auc([0, 1], [0.5, 0.5]) == 0.5
    assert roc_auc([1, 1], [0.1, 0.9]) == 0.5
    # cross-check a mixed case against the closed-form pair count
    labels = [0, 1, 0, 1, 1, 0]
    scores = [0.2, 0.7, 0.4, 0.3, 0.9, 0.1]
    pairs = [(s1 > s0) + 0.5 * (s1 == s0)
             for s1, l1 in zip(scores, labels) if l1
             for s0, l0 in zip(scores, labels) if not l0]
    assert abs(roc_auc(labels, scores) - np.mean(pairs)) < 1e-12


@pytest.mark.parametrize("eval_model", ["flamingo", "blip"])
def test_hateful_memes_cli(eval_model):
    from deer_vla_tpu.cli.vl_eval import main
    res = main(["--task", "hateful_memes", "--debug", "--model", "tiny",
                "--eval_model", eval_model, "--num_samples", "6"])
    assert res["metric"] == "roc_auc" and res["n"] == 6
    assert 0.0 <= res["score"] <= 1.0


def test_imagenet_rank_classification_cli():
    from deer_vla_tpu.cli.vl_eval import main
    res = main(["--task", "imagenet", "--debug", "--model", "tiny",
                "--num_samples", "6"])
    assert res["task"] == "imagenet" and res["metric"] == "top1_acc"
    assert 0.0 <= res["score"] <= 1.0


def test_fewshot_caption_flamingo_rices():
    """K-shot in-context caption eval: RICES demos (self excluded),
    interleaved <image>...<|endofchunk|> prompts, (B, K+1) media."""
    from deer_vla_tpu.cli.vl_eval import main
    res = main(["--task", "caption", "--debug", "--model", "tiny",
                "--num_samples", "8", "--batch_size", "4",
                "--max_new_tokens", "4", "--rices", "--fewshot",
                "--shots", "2"])
    assert res["shots"] == 2 and res["n"] == 8
    assert 0.0 <= res["score"] <= 1.0


def test_fewshot_vqa_blip_random_demos():
    """BLIP is single-image: few-shot context folds to text-only demos."""
    from deer_vla_tpu.cli.vl_eval import main
    res = main(["--task", "vqa", "--debug", "--model", "tiny",
                "--eval_model", "blip", "--num_samples", "8",
                "--batch_size", "4", "--max_new_tokens", "4",
                "--fewshot", "--shots", "2"])
    assert res["shots"] == 2 and res["metric"] == "vqa_acc"


def test_fewshot_prompt_composition():
    from deer_vla_tpu.eval.eval_models import make_eval_model
    f = make_eval_model(_args(model="tiny", eval_model="flamingo",
                              debug=True))
    p = f.build_fewshot_prompt(["A photo of a cat", "A photo of a dog"],
                               "A photo of ")
    assert p.count("<image>") == 3 and p.count("<|endofchunk|>") == 2
    assert p.endswith("A photo of ")
    b = make_eval_model(_args(model="tiny", eval_model="blip", debug=True))
    q = b.build_fewshot_prompt(["A photo of a cat"], "A photo of ")
    assert "<image>" not in q and q.endswith("A photo of ")


def test_fewshot_vision_shapes():
    import numpy as np
    from deer_vla_tpu.eval.eval_models import make_eval_model
    r = np.random.RandomState(0)
    demos = [[r.randint(0, 256, (16, 16, 3), np.uint8) for _ in range(2)]
             for _ in range(3)]
    queries = [r.randint(0, 256, (16, 16, 3), np.uint8) for _ in range(3)]
    f = make_eval_model(_args(model="tiny", eval_model="flamingo",
                              debug=True))
    v = f.build_fewshot_vision(demos, queries)
    assert v.shape[:3] == (3, 3, 1)  # (B, K+1 media, F=1)
    b = make_eval_model(_args(model="tiny", eval_model="blip", debug=True))
    vb = b.build_fewshot_vision(demos, queries)
    assert vb.shape[0] == 3 and vb.ndim == 4  # single image per row


def test_blip_generate_overflow_is_actionable():
    """Prompts past text.max_positions must raise a clear error, not an
    opaque broadcast failure (few-shot demos can overflow the tiny
    context)."""
    import jax
    from deer_vla_tpu.models.blip import blip_generate, blip_tiny, init_blip
    cfg = blip_tiny()
    params = jax.jit(lambda k: init_blip(k, cfg))(jax.random.PRNGKey(0))
    s = cfg.text.max_positions  # prompt alone fills the context
    ids = np.full((1, s), 5, np.int32)
    ids[0, 0] = cfg.text.bos_token_id
    pix = np.zeros((1, 3, cfg.vision.image_size, cfg.vision.image_size),
                   np.float32)
    with pytest.raises(ValueError, match="max_positions"):
        blip_generate(params, cfg, pix, ids, np.ones_like(ids),
                      max_new_tokens=4)


def test_blip_score_mask_covers_exactly_the_continuation():
    """Regression: the target mask must start AT the prompt length (BLIP
    tokenizers append no trailing specials) — scoring a candidate must not
    include the last prompt token's NLL."""
    from deer_vla_tpu.eval.vl_eval import continuation_target_mask
    from deer_vla_tpu.eval.eval_models import BlipHashTokenizer
    from deer_vla_tpu.models.blip import blip_tiny
    cfg = blip_tiny()
    tok = BlipHashTokenizer(cfg.text.vocab_size, cfg.text.bos_token_id,
                            cfg.text.sep_token_id, cfg.text.pad_token_id)
    ids, mask = tok(["a photo of a cat"])
    _, p_mask = tok(["a photo of a"])
    tm = continuation_target_mask(mask, p_mask, trailing_specials=0)
    # prompt = [DEC] + 4 words -> continuation is exactly the 1 'cat' token
    assert tm[0].sum() == 1 and tm[0, 5] == 1
    # flamingo convention: 2 trailing specials after the prompt
    tm2 = continuation_target_mask(mask, p_mask, trailing_specials=2)
    assert tm2[0].sum() == 3  # eats back into <eoc><eos> positions


def test_calibration_info_sidecar_roundtrip(tmp_path):
    from deer_vla_tpu.train.checkpoint import (load_calibration_info,
                                               load_calibration_values,
                                               save_calibration_values)
    p = str(tmp_path / "m_0.ckpt")
    vals = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    save_calibration_values(p, vals, {"exit_ratio": 0.8, "calib_warm": 4})
    info = load_calibration_info(p)
    assert info == {"exit_ratio": 0.8, "calib_warm": 4}
    np.testing.assert_allclose(load_calibration_values(p), vals)
    assert load_calibration_info(str(tmp_path / "missing.ckpt")) == {}


def test_decode_engine_selection_same_output():
    """--decode_engine kv_cache must produce the same CLI result as the
    recompute engine (token-exact parity is pinned in test_kv_decode.py;
    this covers the routing)."""
    from deer_vla_tpu.cli.vl_eval import main
    base = ["--task", "caption", "--debug", "--model", "tiny",
            "--num_samples", "4", "--batch_size", "2",
            "--max_new_tokens", "4"]
    r1 = main(base + ["--decode_engine", "recompute"])
    r2 = main(base + ["--decode_engine", "kv_cache"])
    assert r1["score"] == r2["score"] and r1["cider"] == r2["cider"]


def test_blip_score_texts_prefers_forced_continuation():
    """The scorer must rank the candidate whose tokens the decoder is
    nudged toward (teacher-forced NLL contract) — validated by checking
    scores are finite, distinct per candidate, and shaped (n,)."""
    from deer_vla_tpu.eval.eval_models import make_eval_model
    m = make_eval_model(_args(model="tiny", eval_model="blip", debug=True))
    r = np.random.RandomState(1)
    vision_one = m.preprocess(r.randint(0, 256, (1, 16, 16, 3), np.uint8))
    scores = m.score_texts(vision_one, ["cat", "dog horse", "bird"])
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()
    assert len(set(np.round(scores, 5))) > 1
