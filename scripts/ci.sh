#!/usr/bin/env bash
# Full local CI: unit/integration tests on the virtual 8-device CPU mesh,
# driver entry checks, and (if a TPU is present) a bench smoke.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== tests (8-device CPU mesh) ==="
# Tier policy (tests/conftest.py): quick <5 min (iteration), medium
# ~15 min (THE default CI tier: every subsystem + full param grids on the
# core-correctness files), full ~44 min (pre-release / when the budget
# allows; xdist barely helps — tests are already XLA-multithreaded — but
# isolates worker crashes).  CI_QUICK=1 / CI_FULL=1 select the others.
if [ "${CI_QUICK:-0}" = "1" ]; then
  python -m pytest tests/ -m quick -q
elif [ "${CI_FULL:-0}" = "1" ]; then
  if python -c "import xdist" 2>/dev/null; then
    python -m pytest tests/ -q -n 4
  else
    python -m pytest tests/ -q
  fi
else
  python -m pytest tests/ -m medium -q
fi

echo "=== graft entries ==="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python __graft_entry__.py

echo "=== CLI smokes ==="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from deer_vla_tpu.cli import train, eval as eval_cli
train.main(["--debug", "--model", "tiny", "--num_joint_epochs", "1",
            "--num_exit_epochs", "0", "--batch_size_calvin", "2",
            "--run_name", "/tmp/ci_run", "--joint_warmup_steps", "0",
            "--rgb_pad", "2", "--gripper_pad", "2", "--logging_steps", "100"])
eval_cli.main(["--debug", "--model", "tiny", "--exit_ratio", "1.0",
               "--calib_batches", "1", "--num_sequences_override", "2",
               "--num_seq", "2"])
print("CLI smokes OK")
EOF

if python -c "import jax; exit(0 if jax.default_backend() == 'tpu' else 1)" 2>/dev/null; then
  echo "=== bench (TPU) ==="
  python bench.py
fi
echo "CI PASSED"
