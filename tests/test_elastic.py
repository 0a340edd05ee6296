"""Elastic launcher + heartbeat (utils/heartbeat.py, scripts/launch_elastic.py)."""

import json
import os
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_heartbeat_write_and_age(tmp_path):
    from deer_vla_tpu.utils.heartbeat import Heartbeat, age_seconds, read_heartbeat
    p = str(tmp_path / "hb.json")
    hb = Heartbeat(p, min_interval=0.0)
    assert hb.beat(epoch=1, step=2)
    d = read_heartbeat(p)
    assert d["epoch"] == 1 and d["step"] == 2
    assert age_seconds(p) < 5.0
    # rate limiting
    hb2 = Heartbeat(p, min_interval=100.0)
    assert hb2.beat() and not hb2.beat()
    # disabled
    assert not Heartbeat(None).beat()
    assert age_seconds(str(tmp_path / "missing.json")) is None


def _write_child(tmp_path, body: str) -> str:
    p = tmp_path / "child.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_launcher_restarts_after_crash(tmp_path):
    """Child crashes on the first attempt, succeeds on the second; the
    launcher restarts it and exits 0."""
    hb = str(tmp_path / "hb.json")
    marker = str(tmp_path / "attempts")
    child = _write_child(tmp_path, f"""
        import json, os, sys, time
        marker = {marker!r}
        n = int(open(marker).read()) if os.path.exists(marker) else 0
        open(marker, "w").write(str(n + 1))
        open({hb!r}, "w").write(json.dumps({{"ts": time.time()}}))
        sys.exit(1 if n == 0 else 0)
    """)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/launch_elastic.py"),
         "--heartbeat", hb, "--timeout", "30", "--poll", "0.2",
         "--max_restarts", "2", "--", sys.executable, child],
        timeout=60).returncode
    assert rc == 0
    assert int(open(marker).read()) == 2


def test_launcher_kills_hung_child(tmp_path):
    """A child that beats once then hangs is killed on heartbeat timeout;
    restarts exhausted -> exit 17."""
    hb = str(tmp_path / "hb.json")
    child = _write_child(tmp_path, f"""
        import json, time
        open({hb!r}, "w").write(json.dumps({{"ts": time.time()}}))
        time.sleep(3600)
    """)
    t0 = time.time()
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/launch_elastic.py"),
         "--heartbeat", hb, "--timeout", "1", "--poll", "0.2",
         "--startup_grace", "5", "--max_restarts", "0", "--",
         sys.executable, child],
        timeout=120).returncode
    assert rc == 17
    assert time.time() - t0 < 60


def test_trainer_writes_heartbeat(tmp_path):
    """Trainer.train touches run_dir/heartbeat.json during the step loop."""
    import dataclasses
    import jax
    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.data.debug_data import DebugBatcher
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.train.trainer import TrainConfig, Trainer

    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    loader = DebugBatcher(cfg, tok, batch_size=2, num_batches=2,
                          img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    run = str(tmp_path / "run")
    tcfg = TrainConfig(run_dir=run, num_joint_epochs=1, num_exit_epochs=0,
                       batch_size=2, logging_steps=1, save_every_epoch=False)
    tr = Trainer(cfg, tcfg, loader)
    tr.heartbeat.min_interval = 0.0
    tr.train()
    p = os.path.join(run, "heartbeat.json")
    assert os.path.exists(p)
    d = json.load(open(p))
    assert d["phase"] == "joint"
