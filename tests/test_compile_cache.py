"""Persistent compilation cache (DEER_COMPILE_CACHE): executables persist
across processes so serving/eval restarts skip the 90s+ engine compiles."""

import os
import subprocess
import sys

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
from deer_vla_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache({path!r}, min_compile_secs=0.0)
import jax.numpy as jnp
import numpy as np

@jax.jit
def f(x, w):
    for _ in range(8):
        x = jnp.tanh(x @ w)
    return x.sum()

x = jnp.asarray(np.random.RandomState(0).randn(64, 64), jnp.float32)
print(float(f(x, x.T)))
"""


def test_cache_persists_across_processes(tmp_path):
    cache = str(tmp_path / "xla_cache")
    env = dict(os.environ, JAX_PLATFORMS="")
    for i in range(2):
        out = subprocess.run(
            [sys.executable, "-c", SCRIPT.format(path=cache)],
            capture_output=True, text=True, timeout=300, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert out.returncode == 0, out.stderr[-2000:]
    entries = os.listdir(cache)
    assert entries, "no persistent cache entries were written"


def test_env_var_hook(tmp_path, monkeypatch):
    from deer_vla_tpu.utils.compile_cache import maybe_enable_compile_cache
    monkeypatch.setenv("DEER_COMPILE_CACHE", str(tmp_path / "c2"))
    path = maybe_enable_compile_cache()
    assert path and os.path.isdir(path)
    import jax
    assert jax.config.jax_compilation_cache_dir == path
    monkeypatch.delenv("DEER_COMPILE_CACHE")
    assert maybe_enable_compile_cache() is None
