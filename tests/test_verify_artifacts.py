"""End-to-end test of the one-command artifact-parity readiness path
(scripts/verify_artifacts.py, VERDICT r2 item 4).

Real published artifacts don't exist in this environment; these tests
fabricate the full FOUR-source artifact set at tiny dims from the SAME
torch mirror modules that prove converter name coverage — raw open_clip
ViT (.pt with a 'state_dict' container), a raw HF MPT snapshot DIRECTORY
(pytorch_model.bin), the OpenFlamingo base (wrapped names), and a DeeR
delta carrying readout hyperparams + a cached calibration 'values' tensor
(eval_calvin.py:455-476,601-611) — then run the verifier end to end and
assert every section passes.  The first run against real weights must not
be this path's first execution.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from deer_vla_tpu.core.config import deer_tiny  # noqa: E402

from test_convert import TorchHead, TorchViT  # noqa: E402
from test_convert_coverage import (TorchComposedDeer,  # noqa: E402
                                   TorchMPTBlock, _strip_biases)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """The four-source synthetic artifact set + a tiny pinned fixture."""
    root = tmp_path_factory.mktemp("artifacts")
    cfg = deer_tiny()
    torch.manual_seed(0)

    # 1. raw open_clip ViT: visual.* under a 'state_dict' container, plus
    #    text-tower glue the converter must ignore
    vit = TorchViT(cfg.vit)
    clip_sd = {"visual." + k: v for k, v in vit.state_dict().items()}
    clip_sd["visual.proj"] = torch.randn(cfg.vit.width, 16)
    clip_sd["token_embedding.weight"] = torch.randn(32, 16)
    clip_sd["ln_final.weight"] = torch.randn(16)
    clip_sd["text_projection"] = torch.randn(16, 16)
    clip_sd["positional_embedding"] = torch.randn(8, 16)
    clip_sd["logit_scale"] = torch.tensor(1.0)
    clip_sd["transformer.resblocks.0.ln_1.weight"] = torch.randn(16)
    torch.save({"state_dict": clip_sd}, root / "ViT-tiny.pt")

    # 2. raw HF MPT snapshot directory (pytorch_model.bin), incl. a wpe
    #    buffer the converter must ignore
    d = cfg.mpt.d_model
    mpt_sd = {}
    for i in range(cfg.n_layers):
        blk = _strip_biases(TorchMPTBlock(d, cfg.mpt.qk_ln))
        for k, v in blk.state_dict().items():
            mpt_sd[f"transformer.blocks.{i}.{k}"] = v
    mpt_sd["transformer.wte.weight"] = torch.randn(cfg.mpt.vocab_size, d)
    mpt_sd["transformer.ln_f.weight"] = torch.randn(d)
    mpt_sd["transformer.wpe.weight"] = torch.randn(64, d)
    snap = root / "mpt-tiny"
    snap.mkdir()
    torch.save(mpt_sd, snap / "pytorch_model.bin")

    # 3. OpenFlamingo base: the parts OpenFlamingo trained, wrapped names
    mirror = TorchComposedDeer(cfg)
    full = mirror.state_dict()
    of_sd = {k: v for k, v in full.items()
             if k.startswith("perceiver.")
             or ".gated_cross_attn_layer." in k}
    of_sd["lang_encoder.transformer.wte.weight"] = \
        torch.randn(cfg.mpt.vocab_size + 2, d)  # +2 special tokens
    torch.save(of_sd, root / "openflamingo.pt")

    # 4. DeeR delta: trainable set + readouts + cached calibration values
    delta_sd = {k: v for k, v in full.items()
                if k.startswith(("perceiver.", "lm_head.", "extra_exit.",
                                 "lm_exit_modules."))
                or ".gated_cross_attn_layer." in k}
    delta_sd["lang_encoder.transformer.wte.weight"] = \
        torch.randn(cfg.mpt.vocab_size + 2, d)
    n_exits = len(cfg.all_exit_ids())
    delta = {"model_state_dict": delta_sd,
             "early_exit_layer": cfg.n_layers - 1,
             "exit_interval": cfg.exit_interval,
             "multi_exit": True, "share_exit": False,
             "head_type": "deterministic", "epoch": 3,
             "values": torch.rand(n_exits, 96) * 0.1}
    torch.save(delta, root / "deer_delta.pth")

    # tiny pinned fixture from the same generator that pinned 3B/9B
    gen = _load_script("gen_artifact_fixtures")
    fixture = gen.build("tiny")
    fx_path = root / "artifact_keys_tiny.json"
    fx_path.write_text(json.dumps(fixture))
    return root, cfg, fx_path


def test_verify_artifacts_end_to_end(artifacts, tmp_path):
    root, cfg, fx_path = artifacts
    verify = _load_script("verify_artifacts")
    rc = verify.main([
        "--model", "tiny", "--workdir", str(tmp_path),
        "--clip_checkpoint", str(root / "ViT-tiny.pt"),
        "--mpt_checkpoint", str(root / "mpt-tiny"),
        "--openflamingo_checkpoint", str(root / "openflamingo.pt"),
        "--deer_checkpoint", str(root / "deer_delta.pth"),
        "--fixture", str(fx_path),
    ])
    assert rc == 0
    report = json.loads((tmp_path / "PARITY_ARTIFACTS.json").read_text())
    assert report["ready"] is True
    # key audit: every source matched its pinned inventory, no shape drift
    for role in ("clip_vit", "mpt_backbone", "openflamingo_base",
                 "deer_delta"):
        audit = report["key_audit"][role]
        assert audit["ok"], audit
        assert audit["missing_pinned_count"] == 0, audit
    # the wte row override (+2 special tokens) was treated as advisory
    assert report["key_audit"]["deer_delta"]["shape_mismatch"] == {}
    # conversion composed all four sources and exported the values sidecar
    assert report["conversion"]["ok"]
    assert report["conversion"]["values_sidecar"]
    # forward check ran at every exit and exits produce distinct actions
    assert report["forward_check"]["ok"]
    assert report["forward_check"]["cfg"]["exits"] == \
        list(cfg.all_exit_ids())
    # solver contract held on the cached values for all three distributions
    assert report["threshold_solver"]["ok"]
    assert set(report["threshold_solver"]["dists"]) == \
        {"exp", "gauss", "gamma"}


def test_verify_artifacts_catches_shape_drift(artifacts, tmp_path):
    """A delta with a wrong-shaped head tensor must fail the key audit."""
    root, cfg, fx_path = artifacts
    bad = torch.load(root / "deer_delta.pth", weights_only=False)
    key = next(k for k in bad["model_state_dict"] if k.startswith("lm_head."))
    bad["model_state_dict"][key] = torch.randn(3, 3)
    bad_path = tmp_path / "bad_delta.pth"
    torch.save(bad, bad_path)
    verify = _load_script("verify_artifacts")
    rc = verify.main([
        "--model", "tiny", "--workdir", str(tmp_path / "w"),
        "--deer_checkpoint", str(bad_path),
        "--fixture", str(fx_path),
    ])
    assert rc == 1
    report = json.loads(
        (tmp_path / "w" / "PARITY_ARTIFACTS.json").read_text())
    assert key in report["key_audit"]["deer_delta"]["shape_mismatch"]
    assert report["ready"] is False


@pytest.mark.skipif(not os.environ.get("DEER_ARTIFACTS_DIR"),
                    reason="real published artifacts not present; set "
                           "DEER_ARTIFACTS_DIR to run")
def test_verify_real_artifacts(tmp_path):
    """The real-artifact gate (BASELINE.json north star): point
    DEER_ARTIFACTS_DIR at a directory holding ViT-L-14.pt, the MPT snapshot
    dir, checkpoint.pt and the DeeR delta, then run the full verifier."""
    d = os.environ["DEER_ARTIFACTS_DIR"]
    verify = _load_script("verify_artifacts")
    rc = verify.main([
        "--model", os.environ.get("DEER_ARTIFACTS_MODEL", "mpt_dolly_3b"),
        "--workdir", str(tmp_path),
        "--clip_checkpoint", os.path.join(d, "ViT-L-14.pt"),
        "--mpt_checkpoint", os.path.join(d, "mpt"),
        "--openflamingo_checkpoint", os.path.join(d, "checkpoint.pt"),
        "--deer_checkpoint", os.path.join(d, "deer_delta.pth"),
    ])
    assert rc == 0
