"""CLI-level regression tests for window-folded (vit_concat / use_hist)
checkpoints through the FULL eval path including calibration.

Round-1 shipped an unreproduced crash (deer_crash.jsonl): `cli/eval.py
--debug --evaluate_from_checkpoint /tmp/run_vc/deer_0.ckpt` died in
calibration with `cannot reshape array of shape (2, 8, 64) into
(-1, 4, 8, 64)` — a window-folded model's per-trajectory hidden states
reshaped with the per-frame window in `generate_exit_deltas`
(models/value_net.py:80 now picks w=1 for vit_concat).  Nothing exercised
CLI-level calibration of these checkpoints, so the fix was unproven.  These
tests train a tiny window-folded model through cli.train and run cli.eval
with --calib_batches over it, in process (CPU via conftest)."""

import numpy as np
import pytest

from deer_vla_tpu.cli.eval import main as eval_main
from deer_vla_tpu.cli.train import main as train_main


def _train(tmp_path, extra):
    run = str(tmp_path / "run")
    train_main([
        "--debug", "--model", "tiny", "--num_joint_epochs", "1",
        "--num_exit_epochs", "0", "--batch_size_calvin", "2",
        "--precision", "fp32", "--run_name", run, *extra])
    return run + "/deer_0.ckpt"


def _eval(ckpt, extra=()):
    return eval_main([
        "--debug", "--evaluate_from_checkpoint", ckpt, "--precision", "fp32",
        "--num_sequences_override", "2", "--exit_ratio", "1.0",
        "--calib_batches", "1", *extra])


@pytest.mark.parametrize("flags", [
    ["--fusion_mode", "vit_concat"],
    ["--use_hist"],
], ids=["vit_concat", "use_hist"])
def test_cli_calibration_of_window_folded_ckpt(tmp_path, flags):
    ckpt = _train(tmp_path, flags)
    report = _eval(ckpt)
    assert np.isfinite(report["avg_seq_len"])
    assert report["avg_exit_layer"] > 0


def test_cli_streamed_recommendation_printed(tmp_path, capsys):
    """The --calib_streamed decision rule (round 5 promotion): a STREAMING
    config calibrating folded gets the recommendation printed; passing the
    flag (or a window-folded model) silences it."""
    ckpt = _train(tmp_path, [])  # default post fusion, real window
    _eval(ckpt)
    assert "RECOMMENDED" in capsys.readouterr().out
    _eval(ckpt, ["--calib_streamed", "--recompute_values"])
    assert "RECOMMENDED" not in capsys.readouterr().out


def test_cli_window_folded_no_streamed_recommendation(tmp_path, capsys):
    ckpt = _train(tmp_path, ["--fusion_mode", "vit_concat"])
    _eval(ckpt)
    assert "RECOMMENDED" not in capsys.readouterr().out


def test_cli_vit_concat_with_state(tmp_path):
    """State-trained window-folded model: serves through DeerPolicy's
    window-folded path (cli forces the bucketed engine for state models)."""
    ckpt = _train(tmp_path, ["--fusion_mode", "vit_concat", "--use_state"])
    report = _eval(ckpt)
    assert np.isfinite(report["avg_seq_len"])
