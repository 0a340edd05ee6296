"""Profiling & observability utilities.

The reference's tracing story is torch.cuda.synchronize wall probes and
thop/fvcore FLOPs counters (SURVEY §5.1).  Here:
  * `trace(logdir)`    — context manager around jax.profiler (XLA trace
                         viewable in TensorBoard/xprof)
  * `Timer`            — lightweight block timer with block_until_ready
  * `MetricLogger`     — JSONL metrics sink with optional wandb mirroring
                         (the reference logs per-exit losses to wandb,
                         train_utils.py:589-615)
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/deer_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """with Timer("vit") as t: ... ; t.ms"""

    def __init__(self, name: str = "", sync_on=None):
        self.name = name
        self.sync_on = sync_on
        self.ms = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_on is not None:
            jax.block_until_ready(self.sync_on)
        self.ms = (time.perf_counter() - self._t0) * 1000.0
        return False


class MetricLogger:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict] = None):
        self.path = path
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                        exist_ok=True)
            self._f = open(path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(**(wandb_kwargs or {}))
                self.wandb = wandb
            except Exception:
                pass  # wandb optional; JSONL is the source of truth

    def log(self, metrics: Dict) -> None:
        rec = {k: (float(v) if hasattr(v, "item") else v)
               for k, v in metrics.items()}
        rec.setdefault("ts", time.time())
        if self._f:
            self._f.write(json.dumps(rec, default=float) + "\n")
            self._f.flush()
        if self.wandb is not None:
            self.wandb.log(rec)

    def close(self):
        if self._f:
            self._f.close()
