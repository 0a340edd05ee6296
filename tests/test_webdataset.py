"""Webdataset-format pretraining readers (LAION / MMC4 interleaved)."""

import dataclasses
import tarfile

import jax
import numpy as np
import pytest

from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.data.webdataset import (WebLoader, decode_laion_sample,
                                          decode_mmc4_sample,
                                          iter_tar_samples,
                                          prepare_interleaved_batch,
                                          write_synthetic_laion_shard,
                                          write_synthetic_mmc4_shard)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds")
    laion = []
    for i in range(3):
        p = str(d / f"laion-{i:05d}.tar")
        write_synthetic_laion_shard(p, n=6, hw=48, seed=i)
        laion.append(p)
    mmc4 = str(d / "mmc4-00000.tar")
    write_synthetic_mmc4_shard(mmc4, n=8, hw=48, n_images=3, n_sentences=5,
                               seed=7)
    return laion, mmc4


def test_tar_grouping_and_laion_decode(shards):
    laion, _ = shards
    samples = list(iter_tar_samples(laion[0]))
    assert len(samples) == 6
    assert set(samples[0]) == {"jpg", "txt"}
    s = decode_laion_sample(samples[0], image_size=64)
    assert s["images"].shape == (1, 64, 64, 3)
    assert s["text"].startswith("<image>") and s["text"].endswith("<|endofchunk|>")
    # missing caption -> rejected
    assert decode_laion_sample({"jpg": samples[0]["jpg"]}, 64) is None


def test_mmc4_decode(shards):
    _, mmc4 = shards
    raws = list(iter_tar_samples(mmc4))
    decoded = [decode_mmc4_sample(r, 48, sim_threshold=0.0, max_num_images=4)
               for r in raws]
    kept = [d for d in decoded if d is not None]
    assert kept, "threshold 0 must keep multi-image samples"
    for d in kept:
        assert d["images"].shape == (4, 48, 48, 3)
        assert 1 <= d["n_images"] <= 3
        assert d["text"].count("<image>") == d["n_images"]
        # first marker has no leading <|endofchunk|> (data.py:232)
        assert not d["text"].startswith("<|endofchunk|>")
        assert d["text"].endswith("<|endofchunk|>")
    # impossible threshold -> everything rejected
    assert all(decode_mmc4_sample(r, 48, sim_threshold=2.0) is None
               for r in raws)


def test_webloader_batches_and_sharding(shards):
    laion, _ = shards
    tok = HashTokenizer(vocab_size=512, max_length=32)
    loader = WebLoader(laion, tok, kind="laion", batch_size=4, image_size=48)
    batches = list(loader)
    assert len(batches) == 4  # 18 samples -> 4 full batches of 4
    b = batches[0]
    assert b["image"].shape == (4, 1, 48, 48, 3)
    assert b["input_ids"].shape == b["attention_mask"].shape
    assert (b["input_ids"] == tok.media_token_id).sum() == 4

    # rank sharding partitions shards disjointly
    l0 = WebLoader(laion, tok, kind="laion", batch_size=4, image_size=48,
                   rank=0, world_size=3)
    l1 = WebLoader(laion, tok, kind="laion", batch_size=4, image_size=48,
                   rank=1, world_size=3)
    assert set(l0._epoch_shards()).isdisjoint(l1._epoch_shards())
    all_ranks = sum((WebLoader(laion, tok, kind="laion", batch_size=4,
                               rank=r, world_size=3)._epoch_shards()
                     for r in range(3)), [])
    assert sorted(all_ranks) == sorted(laion)
    # epoch changes shard order deterministically
    e0 = loader._epoch_shards()
    loader.set_epoch(1)
    assert loader._epoch_shards() != e0 or len(laion) == 1


def test_interleaved_tokenization_roundtrip():
    tok = HashTokenizer(vocab_size=512, max_length=64)
    ids, mask = tok.encode_raw(
        ["<image>first chunk<|endofchunk|><image>second<|endofchunk|>"], 64)
    assert (ids[0] == tok.media_token_id).sum() == 2
    assert (ids[0] == tok.eoc_token_id).sum() == 2
    assert ids.shape == (1, 64) and mask[0].sum() < 64


def test_webvl_cotrain_adapter(shards):
    """WebVLLoader adapts laion shards to the --cotrain vl_loader contract:
    single-image uint8 batches that prepare_vl_batch converts for lm_loss."""
    import jax.numpy as jnp
    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.data.webdataset import WebVLLoader
    from deer_vla_tpu.train.trainer import prepare_vl_batch

    laion, _ = shards
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=32)
    vl = WebVLLoader(WebLoader(laion, tok, kind="laion", batch_size=3,
                               image_size=cfg.vit.image_size))
    raw = next(iter(vl))
    assert raw["image"].shape == (3, cfg.vit.image_size, cfg.vit.image_size, 3)
    dev = prepare_vl_batch(raw, cfg)
    assert dev["image"].shape[0] == 3 and dev["image"].ndim == 6
    assert dev["input_ids"].shape == (3, cfg.text_len)
    vl.set_epoch(1)  # interface passthrough


def test_mmc4_pretrain_step_integration(shards):
    """An MMC4 batch flows through prepare_interleaved_batch + the LM
    pretraining step on the tiny config."""
    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.models.flamingo import init_deer, trainable_mask
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.pretrain import make_pretrain_step

    _, mmc4 = shards
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=64)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    loader = WebLoader([mmc4], tok, kind="mmc4", batch_size=2,
                       image_size=cfg.vit.image_size, max_tokens=48,
                       sim_threshold=0.0, max_num_images=3)
    batch = next(iter(loader))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-3,
                         warmup_steps=0, total_steps=2,
                         trainable=trainable_mask(params, cfg, "joint"))
    step = make_pretrain_step(cfg, opt, donate=False)
    dev_batch = {"image": prepare_interleaved_batch(
                     batch, cfg.vit.image_size),
                 "input_ids": batch["input_ids"],
                 "attention_mask": batch["attention_mask"]}
    opt_state = opt.init(params)
    params, opt_state, metrics = step(params, opt_state, dev_batch)
    assert np.isfinite(float(metrics["lm_loss"]))
    assert int(metrics["tokens"]) > 0
