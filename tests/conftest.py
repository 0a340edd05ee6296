"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-runs them; see __graft_entry__.dryrun_multichip).

IMPORTANT: this host's sitecustomize (axon TPU tunnel) force-sets
jax_platforms="axon,cpu" at interpreter startup, overriding JAX_PLATFORMS.
Eager test code on the tunneled TPU pays a network round trip PER OP, so we
must override the config again here, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: the suite re-compiles the same tiny-model
# programs across files; caching cuts full-suite time dramatically on reruns
jax.config.update("jax_compilation_cache_dir", "/tmp/deer_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
