"""deer-convert CLI: compose the reference's two torch artifacts (base +
trainable delta, eval_calvin.py:543,577) into a native .ckpt + sidecars and
serve the result through the standard eval path."""

import dataclasses

import jax
import numpy as np
import pytest
import torch

from deer_vla_tpu.core.config import deer_tiny
from test_convert_coverage import TorchComposedDeer


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("torch_ckpts")
    cfg = deer_tiny()
    torch.manual_seed(0)
    mirror = TorchComposedDeer(cfg)
    base = {k: v.detach().clone() for k, v in mirror.state_dict().items()}
    torch.save(base, tmp / "openflamingo_base.pt")

    # trainable-delta: the keys the reference's get_checkpoint keeps
    # (grad-filtered: x-attn, embeddings, heads — train_utils.py:631-638),
    # perturbed so we can prove the delta OVERWROTE the base values
    delta = {}
    for k, v in base.items():
        if ("gated_cross_attn_layer" in k or k.endswith("wte.weight")
                or k.startswith(("lm_head.", "extra_exit.",
                                 "lm_exit_modules."))):
            delta[k] = v + 0.25
    deer = {
        "model_state_dict": delta,
        "epoch": 3,
        "head_type": "deterministic",
        "early_exit_layer": cfg.n_layers - 1,
        "multi_exit": True,
        "share_exit": False,
        "exit_interval": 2,
        "mlp_layernorm": False,
        "lstm_layernorm": False,
        "mlp_num_hidden_layers": cfg.head.mlp_num_hidden_layers,
        "lstm_num_layers": cfg.head.lstm_num_layers,
        "pooling": "max",
        "values": torch.rand(cfg.num_exits, 50),
    }
    torch.save(deer, tmp / "deer_delta.pth")
    return cfg, tmp, base


def test_convert_cli_end_to_end(artifacts, tmp_path):
    cfg, tmp, base = artifacts
    from deer_vla_tpu.cli.convert import main as convert_main
    out = str(tmp_path / "conv" / "deer")
    convert_main([
        "--model", "tiny", "--max_layer", str(cfg.n_layers),
        "--openflamingo_checkpoint", str(tmp / "openflamingo_base.pt"),
        "--deer_checkpoint", str(tmp / "deer_delta.pth"),
        "--out", out])

    # delta overwrote base: x-attn to_q came from the +0.25 delta
    from deer_vla_tpu.core.config import DeerConfig
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.train.checkpoint import (load_calibration_values,
                                               load_checkpoint)
    import json
    side = json.load(open(out + ".json"))
    ccfg = DeerConfig.from_json(json.dumps(side["config"]))
    assert ccfg.n_layers == cfg.n_layers
    assert side["meta"]["epoch"] == 3
    template = init_deer(jax.random.PRNGKey(0), ccfg)
    params, _, _ = load_checkpoint(out + ".ckpt", template)
    want = (base["lang_encoder.transformer.blocks.0.gated_cross_attn_layer."
                 "attn.to_q.weight"].numpy().T + 0.25)
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["xattn"][0]["to_q"]["w"]), want,
        rtol=1e-6)
    # frozen decoder block weights came from the BASE (not random init)
    want_qkv = base["lang_encoder.transformer.blocks.0.decoder_layer."
                    "attn.Wqkv.weight"].numpy().T
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["blocks"][0]["wqkv"]["w"]), want_qkv,
        rtol=1e-6)
    # cached calibration values landed in the sidecar
    vals = load_calibration_values(out + ".ckpt")
    assert vals is not None and vals.shape == (cfg.num_exits, 50)

    # the converted checkpoint serves through the standard eval CLI
    from deer_vla_tpu.cli.eval import main as eval_main
    rep = eval_main([
        "--debug", "--evaluate_from_checkpoint", out + ".ckpt",
        "--precision", "fp32", "--num_sequences_override", "2",
        "--exit_ratio", "1.0", "--calib_batches", "1"])
    assert np.isfinite(rep["avg_seq_len"])


def test_convert_cli_delta_only_warns_and_writes(artifacts, tmp_path,
                                                 capsys):
    """Delta-only conversion (no base): loud random-backbone warning, but
    the delta still lands and the readouts still apply."""
    cfg, tmp, base = artifacts
    from deer_vla_tpu.cli.convert import main as convert_main
    out = str(tmp_path / "delta_only" / "deer")
    convert_main([
        "--model", "tiny", "--max_layer", str(cfg.n_layers),
        "--deer_checkpoint", str(tmp / "deer_delta.pth"), "--out", out])
    said = capsys.readouterr().out
    assert "RANDOM init" in said
    import json
    side = json.load(open(out + ".json"))
    assert side["config"]["exit_interval"] == 2  # ckpt-dict readout
    assert side["meta"]["epoch"] == 3


def test_convert_cli_refuses_naming_drift(artifacts, tmp_path):
    cfg, tmp, base = artifacts
    drifted = dict(base)
    drifted["lang_encoder.transformer.blocks.0.decoder_layer."
            "attn.Wqkv_RENAMED.weight"] = torch.zeros(
        3 * cfg.mpt.d_model, cfg.mpt.d_model)
    torch.save(drifted, tmp_path / "drift.pt")
    from deer_vla_tpu.cli.convert import main as convert_main
    with pytest.raises(SystemExit, match="unconsumed|NOT consumed"):
        convert_main([
            "--model", "tiny", "--max_layer", str(cfg.n_layers),
            "--openflamingo_checkpoint", str(tmp_path / "drift.pt"),
            "--out", str(tmp_path / "x")])
