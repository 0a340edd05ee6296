"""Device-mesh construction for data/fsdp/tensor parallel training.

The reference's distributed runtime is torchrun + NCCL DDP
(open_flamingo/train/distributed.py:73-132, DDP wrap at
train_calvin_post_strategy.py:464) with an unused upstream FSDP path
(flamingo.py:202-301).  TPU-native: one jax.sharding.Mesh with axes

  dp   — data parallel (DDP equivalent; grad psum over ICI is inserted by
          XLA when the batch is sharded and params are replicated)
  fsdp — parameter sharding (ZeRO-3 / FULL_SHARD equivalent; params sharded
          on one dim, all-gathered by XLA at use)
  tp   — tensor parallel (reserved for the 9B config)

Multi-node = more devices in the same mesh (JAX multi-process runtime over
DCN); no NCCL-equivalent code is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, fsdp: int = 1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp) == 0, (n, fsdp, tp)
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, f"mesh {dp}x{fsdp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over dp x fsdp (both act as data parallel
    when params are fsdp-sharded, matching HYBRID_SHARD semantics)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape["dp"] * mesh.shape["fsdp"]
    assert global_batch % n == 0
    return global_batch // n
