"""Persistent XLA compilation cache.

Cold-start compiles dominate serving/eval restarts on this stack: the 3B
while-loop engine compiles ~90 s over the tunneled TPU runtime, the
lax.cond-chain engine far longer.  JAX's persistent compilation cache
(jax_compilation_cache_dir) stores compiled executables keyed by program +
compile options + backend, so a restarted host (deer-serve, eval sweeps,
BO rounds in subprocesses) skips recompilation entirely.

Opt-in via the DEER_COMPILE_CACHE env var (a directory path) or an explicit
``enable_compile_cache(path)`` call; every CLI calls
``maybe_enable_compile_cache()`` at startup.  The reference has no
equivalent (torch eager; its only compile-ish cost is CUDA kernel JIT).
"""

from __future__ import annotations

import os

_ENV = "DEER_COMPILE_CACHE"


def enable_compile_cache(path: str, min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing).  min_compile_secs filters trivial programs so the cache holds
    the expensive serving/train executables, not every 2-op jit."""
    import jax
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path


def maybe_enable_compile_cache() -> str | None:
    """Enable the cache iff DEER_COMPILE_CACHE is set; returns the dir."""
    path = os.environ.get(_ENV, "").strip()
    if not path:
        return None
    return enable_compile_cache(path)
