"""AOT serving export (serving/export.py + cli/export.py): round-trip the
fused dynamic-exit step through jax.export bytes and prove the deserialized
program is the live program."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.serving.export import (ExportedScanPolicy, export_policy,
                                         load_exported, save_exported)


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, batch=1, seed=0):
    r = np.random.RandomState(seed)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = r.randn(batch, 1, 1, 3, hw, hw).astype(np.float32)
    grip = r.randn(batch, 1, 1, 3, hw, hw).astype(np.float32)
    ids = np.full((batch, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    return img, grip, ids, np.ones((batch, s), np.int32)


def test_export_roundtrip_bit_exact(setup, tmp_path):
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = setup
    blob, meta = export_policy(params, cfg, batch_size=1, platforms=("cpu",))
    path = str(tmp_path / "step.aot")
    save_exported(path, blob, meta)
    assert os.path.exists(path) and os.path.exists(path + ".json")
    exp, meta2 = load_exported(path)
    assert meta2["exits"] == meta["exits"]
    assert meta2["arg_order"][0] == "params"

    live = ScanDeerPolicy(params, cfg)
    aot = ExportedScanPolicy(path, params, cfg)
    ths = [[1e8] * len(live.exits),  # exit at first
           [-1e8] * (len(live.exits) - 1) + [1e8]]  # full depth
    for th in ths:
        live.set_thresholds(list(th))
        aot.set_thresholds(list(th))
        live.reset(), aot.reset()
        for step_i in range(3):  # carry threads across steps
            img, grip, ids, mask = _inputs(cfg, seed=step_i)
            a_live = live.step(img, grip, ids, mask)
            a_aot = aot.step(img, grip, ids, mask)
            np.testing.assert_array_equal(a_live, a_aot)
        assert aot.last_exit_layer == live.last_exit_layer


def test_export_batched_shapes(setup, tmp_path):
    cfg, params = setup
    blob, meta = export_policy(params, cfg, batch_size=4, platforms=("cpu",))
    path = str(tmp_path / "b4.aot")
    save_exported(path, blob, meta)
    aot = ExportedScanPolicy(path, params, cfg)
    img, grip, ids, mask = _inputs(cfg, batch=4)
    act = aot.step(img, grip, ids, mask)  # policy returns stream 0's action
    assert act.shape == (7,)
    # wrong batch must fail loudly (static AOT shapes)
    img1, grip1, ids1, mask1 = _inputs(cfg, batch=2)
    aot.reset()
    with pytest.raises(Exception):
        aot.step(img1, grip1, ids1, mask1)


def test_export_exit_mismatch_rejected(setup, tmp_path):
    cfg, params = setup
    blob, meta = export_policy(params, cfg, batch_size=1, platforms=("cpu",))
    path = str(tmp_path / "m.aot")
    # corrupt the recorded exits
    meta_bad = dict(meta, exits=[0])
    save_exported(path, blob, meta_bad)
    with pytest.raises(ValueError, match="wrong checkpoint/config"):
        ExportedScanPolicy(path, params, cfg)


def test_export_int8_roundtrip_bit_exact(setup, tmp_path):
    """quantize='int8' export: the artifact bakes the int8 stacked layout;
    the reloaded program is bit-exact vs the live int8 engine, and a host
    that requests a mismatched quantize mode is rejected."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = setup
    blob, meta = export_policy(params, cfg, batch_size=1, platforms=("cpu",),
                               quantize="int8")
    assert meta["quantize"] == "int8"
    path = str(tmp_path / "q8.aot")
    save_exported(path, blob, meta)

    live = ScanDeerPolicy(params, cfg, quantize="int8")
    aot = ExportedScanPolicy(path, params, cfg)  # quantize from meta
    th = [-1e8] * (len(live.exits) - 1) + [1e8]  # full depth
    live.set_thresholds(list(th)), aot.set_thresholds(list(th))
    for step_i in range(3):
        img, grip, ids, mask = _inputs(cfg, seed=step_i)
        a_live = live.step(img, grip, ids, mask)
        a_aot = aot.step(img, grip, ids, mask)
        np.testing.assert_array_equal(a_live, a_aot)
    assert aot.last_exit_layer == live.last_exit_layer

    with pytest.raises(ValueError, match="quantize"):
        ExportedScanPolicy(path, params, cfg, quantize=None)
    # fp artifact rejects an int8 host request the same way
    blob_fp, meta_fp = export_policy(params, cfg, batch_size=1,
                                     platforms=("cpu",))
    path_fp = str(tmp_path / "fp.aot")
    save_exported(path_fp, blob_fp, meta_fp)
    with pytest.raises(ValueError, match="quantize"):
        ExportedScanPolicy(path_fp, params, cfg, quantize="int8")


def test_export_gpt_head_roundtrip(tmp_path):
    """Alt-head export: the gpt head's rolling-history carry rides the
    artifact's argument specs (any_zero_carry); round-trip bit-exact."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg = dataclasses.replace(deer_tiny(), head_type="gpt")
    params = init_deer(jax.random.PRNGKey(3), cfg)
    blob, meta = export_policy(params, cfg, batch_size=1, platforms=("cpu",))
    path = str(tmp_path / "gpt.aot")
    save_exported(path, blob, meta)
    live = ScanDeerPolicy(params, cfg, thresholds=[-1e8, 1e8])
    aot = ExportedScanPolicy(path, params, cfg)
    aot.set_thresholds([-1e8, 1e8])
    for step_i in range(3):
        img, grip, ids, mask = _inputs(cfg, seed=step_i)
        np.testing.assert_array_equal(live.step(img, grip, ids, mask),
                                      aot.step(img, grip, ids, mask))
    assert int(np.asarray(aot.carry.count)[0]) == 3
    assert aot.last_exit_layer == live.last_exit_layer


@pytest.mark.parametrize("quantize", [None, "int8", "int4"])
def test_bundle_roundtrip_no_model_python(setup, tmp_path, quantize):
    """Self-contained bundle: artifact + packed weight trees; the loaded
    BundledScanPolicy runs with no checkpoint and no init_deer, bit-exact
    vs the live engine (incl. the int8/int4 layouts — int4 bundles ship the
    nibble-packed weights ~4x smaller than bf16)."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.serving.export import BundledScanPolicy, save_bundle
    cfg, params = setup
    blob, meta, policy = export_policy(params, cfg, batch_size=1,
                                       platforms=("cpu",), quantize=quantize,
                                       return_policy=True)
    path = str(tmp_path / f"b_{quantize}.step")
    save_bundle(path, blob, meta, policy)
    assert os.path.exists(path + ".weights")

    live = ScanDeerPolicy(params, cfg, quantize=quantize)
    bundled = BundledScanPolicy(path)
    assert bundled.quantize == quantize
    th = [-1e8] * (len(live.exits) - 1) + [1e8]
    live.set_thresholds(list(th)), bundled.set_thresholds(list(th))
    for step_i in range(3):
        img, grip, ids, mask = _inputs(cfg, seed=step_i)
        np.testing.assert_array_equal(live.step(img, grip, ids, mask),
                                      bundled.step(img, grip, ids, mask))
    assert bundled.last_exit_layer == live.last_exit_layer


def test_bundle_int8_weights_smaller(setup, tmp_path):
    cfg, params = setup
    sizes = {}
    for q in (None, "int8"):
        from deer_vla_tpu.serving.export import save_bundle
        blob, meta, policy = export_policy(params, cfg, batch_size=1,
                                           platforms=("cpu",), quantize=q,
                                           return_policy=True)
        p = str(tmp_path / f"s_{q}.step")
        save_bundle(p, blob, meta, policy)
        sizes[q] = os.path.getsize(p + ".weights")
    assert sizes["int8"] < 0.7 * sizes[None]


def test_export_cli_check(tmp_path):
    """End-to-end: train-free tiny model through the CLI with --check
    (exports, reloads, compares vs the live engine)."""
    from deer_vla_tpu.cli.export import main
    out = str(tmp_path / "cli.aot")
    rc = main(["--model", "tiny", "--out", out, "--platforms", "cpu",
               "--check", "--precision", "fp32"])
    assert rc == 0
    with open(out + ".json") as f:
        meta = json.load(f)
    assert meta["platforms"] == ["cpu"]
