"""LM pretraining step, greedy generation, RICES, VQA metrics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import init_deer


@pytest.fixture(scope="module")
def tiny():
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_lm_loss_and_pretrain_step(tiny):
    cfg, params = tiny
    import optax
    from deer_vla_tpu.models.flamingo import trainable_mask
    from deer_vla_tpu.train.pretrain import lm_loss, make_pretrain_step

    r = np.random.RandomState(0)
    b = 2
    img = jnp.asarray(r.randn(b, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((b, cfg.text_len), 5, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((b, cfg.text_len), jnp.int32)

    loss, m = lm_loss(params, cfg, img, ids, mask)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # roughly ln(vocab) at random init
    assert float(loss) < np.log(cfg.mpt.vocab_size) * 3

    opt = optax.adam(1e-3)
    step = make_pretrain_step(cfg, opt, donate=False)
    p, st = params, opt.init(params)
    batch = {"image": img, "input_ids": ids, "attention_mask": mask}
    l0 = float(lm_loss(p, cfg, img, ids, mask)[0])
    for _ in range(5):
        p, st, metrics = step(p, st, batch)
    l1 = float(lm_loss(p, cfg, img, ids, mask)[0])
    assert l1 < l0  # memorizes the constant batch


def test_greedy_generate(tiny):
    cfg, params = tiny
    from deer_vla_tpu.eval.vl_eval import greedy_generate
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(2, 1, 1, 3, 28, 28), jnp.float32)
    prompt = np.full((2, 4), 5, np.int32)
    prompt[:, 0] = cfg.media_token_id
    pm = np.ones((2, 4), np.int32)
    out = greedy_generate(params, cfg, img, prompt, pm, max_new_tokens=5)
    assert out.shape == (2, 5)
    assert np.all((out >= 0) & (out < cfg.mpt.vocab_size))
    # deterministic
    out2 = greedy_generate(params, cfg, img, prompt, pm, max_new_tokens=5)
    np.testing.assert_array_equal(out, out2)


def test_rices_retrieval(tiny):
    cfg, params = tiny
    from deer_vla_tpu.eval.vl_eval import RICES
    r = np.random.RandomState(0)
    train = r.randn(6, 3, 28, 28).astype(np.float32)
    rices = RICES(params, cfg, batch_size=4)
    rices.build_index(train)
    assert rices.features.shape[0] == 6
    # the query equal to a train image must retrieve itself as closest
    idx = rices.retrieve(train[2:3], k=3)
    assert idx.shape == (1, 3)
    assert idx[0, -1] == 2  # closest example comes LAST


def test_vqa_metrics():
    """Official vqaEval.py leave-one-out semantics: mean over the k subsets
    of size k-1 of min(matches_in_subset/3, 1)."""
    from deer_vla_tpu.eval.vl_eval import caption_bleu1, vqa_accuracy
    assert vqa_accuracy("The red block", ["red block"] * 10) == 1.0
    assert vqa_accuracy("blue", ["red"] * 10) == 0.0
    # 3 of 10 matching: (7*min(3/3,1) + 3*min(2/3,1)) / 10 = 0.9
    assert vqa_accuracy("red", ["red"] * 3 + ["blue"] * 7) == pytest.approx(0.9)
    # 1 of 10 matching: (9*(1/3) + 1*0) / 10 = 0.3
    assert vqa_accuracy("red", ["red"] + ["blue"] * 9) == pytest.approx(0.3)
    # single-answer fallback keeps the simple clip
    assert vqa_accuracy("red", ["red"]) == pytest.approx(1 / 3)
    assert caption_bleu1("a red block on the table",
                         ["red block on a table"]) > 0.5
    assert caption_bleu1("", ["anything"]) == 0.0


def test_vqa_official_normalization():
    """The VQAEval normalization tables (vqa_metric.py:245-320): number
    words, contraction repair, article drop, punctuation/comma rules."""
    from deer_vla_tpu.eval.vl_eval import vqa_accuracy, vqa_normalize
    assert vqa_normalize("Two") == "2"
    assert vqa_normalize("the dog") == "dog"
    assert vqa_normalize("dont") == "don't"
    assert vqa_normalize("1,000") == "1000"
    assert vqa_normalize("yes.") == "yes"
    assert vqa_normalize("3.5") == "3.5"  # decimal point survives
    assert vqa_normalize("red, white") == "red white"
    # normalization makes these count as matches
    assert vqa_accuracy("two", ["2"] * 10) == 1.0
    assert vqa_accuracy("dont know", ["don't know"] * 10) == 1.0


def test_okvqa_stemming_protocol():
    """OK-VQA protocol: generation cut at markers, -ing lemmatized, plurals
    singularized, and BOTH sides stemmed before the accuracy compare."""
    from deer_vla_tpu.eval.vl_eval import (okvqa_accuracy, okvqa_stem,
                                           postprocess_vqa_generation)
    assert postprocess_vqa_generation("ride Question: what") == "ride"
    assert postprocess_vqa_generation("red, white and blue") == "red"
    assert okvqa_stem("riding") == "ride"
    assert okvqa_stem("running") == "run"
    assert okvqa_stem("firefighting") == "firefight"
    assert okvqa_stem("gloves") == "glove"
    assert okvqa_stem("cities") == "city"
    assert okvqa_stem("glass") == "glass"
    assert okvqa_accuracy("riding Question: next", ["rides"] * 10) == 1.0
    assert okvqa_accuracy("dog", ["dogs"] * 10) == 1.0
    assert okvqa_accuracy("cat", ["dog"] * 10) == 0.0


def test_classification_by_lm_score(tiny):
    """After memorizing 'A photo of a cat' for one image, LM scoring must
    rank 'cat' lowest-NLL among candidates (the upstream ImageNet-style
    classification harness path)."""
    import dataclasses
    import optax
    from deer_vla_tpu.data.text import HashTokenizer, fixed_length
    from deer_vla_tpu.eval.vl_eval import classify_by_lm_score
    from deer_vla_tpu.train.pretrain import make_pretrain_step

    cfg, params = tiny
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(1, 1, 1, 3, 28, 28), jnp.float32)
    ids, mask = tok(["A photo of a cat"])
    ids, mask = fixed_length(ids, mask, cfg.text_len, tok.pad_token_id)
    batch = {"image": img, "input_ids": jnp.asarray(ids),
             "attention_mask": jnp.asarray(mask)}
    opt = optax.adam(3e-3)
    st = opt.init(params)
    step = make_pretrain_step(cfg, opt, donate=False)
    p = params
    for _ in range(30):
        p, st, m = step(p, st, batch)
    idx, scores = classify_by_lm_score(p, cfg, img, ["dog", "cat", "banana"], tok)
    assert idx == 1
    assert scores[1] < scores[0] and scores[1] < scores[2]


def test_cider_d_properties():
    """CIDEr-D sanity: exact match scores max-ish, disjoint scores 0,
    partial overlap in between; rare n-grams weigh more than common ones."""
    from deer_vla_tpu.eval.vl_eval import cider_d
    refs = [["a red block on the table"],
            ["a man riding a horse"],
            ["two cats sleeping on a couch"],
            ["a plate of pasta with sauce"]]
    exact = [r[0] for r in refs]
    s_exact = cider_d(exact, refs)
    assert s_exact > 5.0  # identical candidates score high
    disjoint = ["zzz qqq xxx www vvv"] * 4
    assert cider_d(disjoint, refs) == 0.0
    partial = ["a red block", "a man riding", "two cats", "a plate"]
    s_partial = cider_d(partial, refs)
    assert 0.0 < s_partial < s_exact
    # empty corpus / empty prediction don't crash
    assert cider_d([], []) == 0.0
    assert cider_d([""], [["a b c"]]) == 0.0


def test_classify_cli_debug(tmp_path):
    """--task classify end to end on the synthetic fixture: valid top-1
    accuracy over 5 classes."""
    from deer_vla_tpu.cli.vl_eval import main
    res = main(["--task", "classify", "--debug", "--model", "tiny",
                "--num_samples", "4", "--precision", "fp32"])
    assert res["metric"] == "top1_acc" and res["n_classes"] == 5
    assert 0.0 <= res["score"] <= 1.0

def test_karpathy_caption_dataset(tmp_path):
    """Karpathy-split reader: split filtering, first-sentence caption, flickr
    image_id = filename stem, coco image_id = cocoid."""
    import json
    import numpy as np
    from PIL import Image
    from deer_vla_tpu.data.vl_dataset import KarpathyCaptionDataset
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    entries = []
    for i, split in enumerate(["test", "train", "test"]):
        fn = f"im{i}.jpg"
        Image.fromarray(np.full((8, 8, 3), i * 40, np.uint8)).save(
            img_dir / fn)
        entries.append({"filename": fn, "split": split, "cocoid": 100 + i,
                        "sentences": [{"raw": f"first {i}"},
                                      {"raw": f"second {i}"}]})
    p = tmp_path / "karpathy.json"
    p.write_text(json.dumps({"images": entries}))

    ds = KarpathyCaptionDataset(str(img_dir), str(p), dataset_name="flickr",
                                is_train=False, image_size=16)
    assert len(ds) == 2  # train entry filtered out
    s = ds[0]
    assert s["caption"] == "first 0" and s["captions"] == ["first 0",
                                                           "second 0"]
    assert s["image_id"] == "im0" and s["image"].shape == (16, 16, 3)

    ds_tr = KarpathyCaptionDataset(str(img_dir), str(p), dataset_name="coco",
                                   is_train=True, image_size=16)
    assert len(ds_tr) == 1 and ds_tr[0]["image_id"] == 101


def test_flickr_cli_debug(tmp_path):
    """--task flickr end to end: karpathy fixture, CIDEr headline score,
    caption-format predictions json."""
    import json
    from deer_vla_tpu.cli.vl_eval import main
    pred_p = tmp_path / "preds.json"
    res = main(["--task", "flickr", "--debug", "--model", "tiny",
                "--num_samples", "4", "--precision", "fp32",
                "--save_predictions", str(pred_p)])
    assert res["metric"] == "cider" and res["score"] == res["cider"]
    assert "bleu1" in res
    preds = json.loads(pred_p.read_text())
    assert len(preds) == 4
    assert set(preds[0]) == {"image_id", "caption"}
    assert preds[0]["image_id"] == "0"  # filename stem


def test_textvqa_vizwiz_cli_debug(tmp_path):
    """textvqa + vizwiz tasks run the shared VQAEval protocol end to end;
    vizwiz fixture addresses images by full filename."""
    import json
    from deer_vla_tpu.cli.vl_eval import main
    for task in ("textvqa", "vizwiz"):
        pred_p = tmp_path / f"{task}.json"
        res = main(["--task", task, "--debug", "--model", "tiny",
                    "--num_samples", "4", "--precision", "fp32",
                    "--save_predictions", str(pred_p)])
        assert res["metric"] == f"{task}_acc"
        assert 0.0 <= res["score"] <= 1.0
        preds = json.loads(pred_p.read_text())
        assert len(preds) == 4
        assert set(preds[0]) == {"answer", "question_id"}

def test_cache_features_roundtrip(tmp_path):
    """deer-cache-features builds + saves a feature index; vl_eval consumes
    it via --cached_features with identical retrieval to a fresh build."""
    import json
    from deer_vla_tpu.cli.cache_features import main as cache_main
    from deer_vla_tpu.cli.vl_eval import main as eval_main
    feat_p = tmp_path / "feats.npz"
    res = cache_main(["--task", "caption", "--debug", "--model", "tiny",
                      "--num_samples", "6", "--precision", "fp32",
                      "--output", str(feat_p)])
    assert res["n"] == 6 and feat_p.exists()

    common = ["--task", "caption", "--debug", "--model", "tiny",
              "--num_samples", "6", "--precision", "fp32", "--rices"]
    fresh = eval_main(common)
    cached = eval_main(common + ["--cached_features", str(feat_p)])
    # identical model + fixture seed: cached index reproduces retrieval
    assert cached["rices_example"] == fresh["rices_example"]

def test_cache_features_vqa_task(tmp_path):
    """Regression: VQA-style tasks route the fixture's answers json through
    the shared build_dataset (a dropped answers path crashed with
    KeyError 'answers'); missing .npz suffix is normalized."""
    from deer_vla_tpu.cli.cache_features import main as cache_main
    out = tmp_path / "tv_feats"  # no .npz suffix on purpose
    res = cache_main(["--task", "textvqa", "--debug", "--model", "tiny",
                      "--num_samples", "4", "--precision", "fp32",
                      "--output", str(out)])
    import os
    assert res["output"].endswith(".npz") and os.path.exists(res["output"])
    assert res["n"] == 4
