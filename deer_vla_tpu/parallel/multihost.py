"""Multi-host aggregation helpers.

Replaces the reference's explicit collectives outside the model:
  * torch.distributed.all_gather of calibration deltas (value_net.py:195-201)
  * gather_object of rollout result tuples to rank 0 (eval_utils.py:565-568)

With a single-process runtime these are identity; under
`jax.distributed.initialize` they ride `multihost_utils` (ICI/DCN).
Rollout results are small python objects — they serialize via numpy byte
buffers (the gather_object equivalent)."""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def all_gather_values(values: np.ndarray, axis: int = 1) -> np.ndarray:
    """Concatenate per-host calibration arrays across processes."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(values))
    # (n_proc, n_exit, n_samples) -> concat samples
    return np.concatenate(list(gathered), axis=axis)


def gather_objects(obj: Any) -> List[Any]:
    """gather_object equivalent: every process contributes one python
    object; all processes receive the full list (rank-0 filtering is the
    caller's choice)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # pad to the max length across hosts
    n = np.array([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:payload.size] = payload
    all_payloads = multihost_utils.process_allgather(padded)
    return [pickle.loads(bytes(p[:int(s)]))
            for p, s in zip(all_payloads, sizes)]
