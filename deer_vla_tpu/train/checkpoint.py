"""Checkpointing with explicit JSON metadata.

The reference encodes the full config in the checkpoint FILENAME and regexes
it back at eval (train_utils.py:66-158, eval_calvin.py:356-421), saves only
trainable params (train_utils.py:631-638) and caches calibration values
inside the ckpt dict (eval_calvin.py:601-611).  Here:

  * params -> msgpack (flax.serialization) at <dir>/<name>.ckpt
  * config + hyperparams + epoch -> <dir>/<name>.json sidecar
  * calibration deltas -> <dir>/<name>.values.npz sidecar (the reference's
    ckpt["values"] cache, without mutating the weight artifact)
  * trainable-only saving supported via a bool mask; load composes
    base + delta checkpoints (mirrors the OpenFlamingo-base + DeeR two-stage
    non-strict load, eval_calvin.py:543-577).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

from deer_vla_tpu.core.config import DeerConfig


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: dict, cfg: DeerConfig,
                    meta: Optional[Dict] = None,
                    trainable_mask: Optional[dict] = None,
                    opt_state=None) -> str:
    """Write <path>.ckpt (+ .json).  If trainable_mask is given, only leaves
    marked True are stored (delta checkpoint, get_checkpoint equivalent)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tree = params
    if trainable_mask is not None:
        flat_p = flatten_dict(params)
        flat_m = flatten_dict(trainable_mask)
        tree = unflatten_dict({k: v for k, v in flat_p.items() if flat_m[k]})
    payload = {"params": _to_host(tree)}
    if opt_state is not None:
        payload["opt_state"] = _to_host(opt_state)
    with open(path + ".ckpt", "wb") as f:
        f.write(serialization.to_bytes(payload))
    sidecar = {"config": json.loads(cfg.to_json()), "meta": meta or {}}
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    return path + ".ckpt"


def load_checkpoint(path: str, params_template: dict,
                    opt_state_template=None) -> Tuple[dict, Optional[object], Dict]:
    """Non-strict load: leaves present in the file overwrite the template
    (two-stage base+delta composition; missing keys keep template values)."""
    path = path[:-5] if path.endswith(".ckpt") else path
    with open(path + ".ckpt", "rb") as f:
        raw = f.read()
    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
    # decode without a target first to see what keys exist
    loaded = serialization.msgpack_restore(raw)
    flat_t = flatten_dict(params_template, keep_empty_nodes=False)
    flat_l = flatten_dict(loaded.get("params", {}), keep_empty_nodes=False)
    merged = dict(flat_t)
    n_hit = 0
    for k, v in flat_l.items():
        if k in merged:
            ref = merged[k]
            merged[k] = jnp.asarray(v, dtype=getattr(ref, "dtype", None))
            n_hit += 1
    params = unflatten_dict(merged)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    meta.setdefault("meta", {})["loaded_keys"] = n_hit
    opt_state = None
    if opt_state_template is not None and "opt_state" in loaded:
        opt_state = serialization.from_bytes(
            {"params": params_template, "opt_state": opt_state_template},
            raw)["opt_state"]
    return params, opt_state, meta


def save_calibration_values(path: str, values: np.ndarray,
                            info: Optional[Dict] = None) -> None:
    """Cache calibration deltas next to the ckpt (replaces the reference's
    in-place ckpt['values'] mutation, eval_calvin.py:608-611)."""
    path = path[:-5] if path.endswith(".ckpt") else path
    np.savez(path + ".values.npz", values=values,
             info=json.dumps(info or {}))


def load_calibration_values(path: str) -> Optional[np.ndarray]:
    path = path[:-5] if path.endswith(".ckpt") else path
    f = path + ".values.npz"
    if not os.path.exists(f):
        return None
    return np.load(f, allow_pickle=False)["values"]


def find_latest_checkpoint(run_dir: str, pattern: str = r".*_(\d+)\.ckpt$") -> Optional[str]:
    """Auto-resume: newest epoch-numbered ckpt in the run dir
    (train_calvin_post_strategy.py:589-629)."""
    if not os.path.isdir(run_dir):
        return None
    best, best_ep = None, -1
    for fn in os.listdir(run_dir):
        m = re.match(pattern, fn)
        if m and int(m.group(1)) > best_ep:
            best_ep = int(m.group(1))
            best = os.path.join(run_dir, fn)
    return best
