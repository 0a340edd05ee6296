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

from deer_vla_tpu.core.config import DeerConfig


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _flat_state(tree) -> Dict[str, np.ndarray]:
    """Flatten via flax state-dict semantics (lists -> '0','1',... keys)."""
    out = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (str(k),), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(prefix + (str(i),), v)
        elif node is None:
            pass
        else:
            out["/".join(prefix)] = node

    rec((), serialization.to_state_dict(tree) if not isinstance(tree, dict) else tree)
    return out


def _stem(path: str) -> str:
    """Drop a trailing '.ckpt' so sidecar paths derive from one stem."""
    return path[:-5] if path.endswith(".ckpt") else path


def save_checkpoint(path: str, params: dict, cfg: DeerConfig,
                    meta: Optional[Dict] = None,
                    trainable_mask: Optional[dict] = None,
                    opt_state=None) -> str:
    """Write <path>.ckpt (+ .json).  If trainable_mask is given, only leaves
    marked True are stored (delta checkpoint, get_checkpoint equivalent,
    train_utils.py:631-638)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    flat = _flat_state(params)
    if trainable_mask is not None:
        flat_m = _flat_state(trainable_mask)
        flat = {k: v for k, v in flat.items() if flat_m.get(k, False)}
    payload = {"params": {k: np.asarray(v) for k, v in flat.items()}}
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(_to_host(opt_state))
    # atomic: a crash mid-write must never leave a truncated .ckpt that
    # find_latest_checkpoint would select (breaking every auto-resume until
    # someone deletes the file by hand)
    tmp = path + ".ckpt.tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path + ".ckpt")
    sidecar = {"config": json.loads(cfg.to_json()), "meta": meta or {}}
    tmp_j = path + ".json.tmp"
    with open(tmp_j, "w") as f:
        json.dump(sidecar, f, indent=2)
    os.replace(tmp_j, path + ".json")
    return path + ".ckpt"


def load_checkpoint(path: str, params_template: dict,
                    opt_state_template=None) -> Tuple[dict, Optional[object], Dict]:
    """Non-strict load: flat keys present in the file overwrite the template
    (two-stage base+delta composition, eval_calvin.py:543-577; missing keys
    keep template values)."""
    path = _stem(path)
    with open(path + ".ckpt", "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    flat_l = dict(loaded.get("params", {}))
    consumed = set()

    def rec(node, prefix):
        if isinstance(node, dict):
            return {k: rec(v, prefix + (str(k),)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, prefix + (str(i),))
                              for i, v in enumerate(node))
        key = "/".join(prefix)
        if node is not None and key in flat_l:
            consumed.add(key)
            return jnp.asarray(flat_l[key], dtype=getattr(node, "dtype", None))
        return node

    params = rec(params_template, ())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    meta.setdefault("meta", {})["loaded_keys"] = len(consumed)
    # ckpt keys with no home in the template — the reference's
    # check_loaded_parameters diagnostic (eval_utils.py:129-141), surfaced
    # in meta instead of a disabled assert
    unconsumed = sorted(set(flat_l) - consumed)
    meta["meta"]["unconsumed_keys"] = unconsumed
    if unconsumed:
        import warnings
        warnings.warn(
            f"checkpoint {path}: {len(unconsumed)} stored params not "
            f"matched by the model template (first: {unconsumed[:3]})")
    opt_state = None
    if opt_state_template is not None and "opt_state" in loaded:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  loaded["opt_state"])
    return params, opt_state, meta


def save_calibration_values(path: str, values: np.ndarray,
                            info: Optional[Dict] = None) -> None:
    """Cache calibration deltas next to the ckpt (replaces the reference's
    in-place ckpt['values'] mutation, eval_calvin.py:608-611)."""
    path = _stem(path)
    # fp32 on disk: bf16 (ml_dtypes) arrays round-trip through np.savez as
    # raw void bytes and poison the threshold solver on reload
    np.savez(path + ".values.npz",
             values=np.asarray(values).astype(np.float32),
             info=json.dumps(info or {}))


def load_calibration_info(path: str) -> Dict:
    """Metadata recorded beside the cached values (exit_ratio, calib_warm)
    — lets consumers detect a sidecar produced under different calibration
    settings instead of silently reusing it."""
    path = _stem(path)
    f = path + ".values.npz"
    if not os.path.exists(f):
        return {}
    z = np.load(f, allow_pickle=False)
    if "info" not in z.files:
        return {}
    return json.loads(str(z["info"]))


def load_calibration_values(path: str) -> Optional[np.ndarray]:
    path = _stem(path)
    f = path + ".values.npz"
    if not os.path.exists(f):
        return None
    v = np.load(f, allow_pickle=False)["values"]
    if v.dtype.kind == "V":  # legacy sidecar written as raw bf16 bytes
        import ml_dtypes
        v = v.view(ml_dtypes.bfloat16).astype(np.float32)
    return v


def find_latest_checkpoint(
        run_dir: str,
        pattern: str = r".*_(\d+)(?:_it(\d+))?\.ckpt$") -> Optional[str]:
    """Auto-resume: newest ckpt in the run dir
    (train_calvin_post_strategy.py:589-629).

    Names: ``deer_{E}.ckpt`` (end of epoch E) and ``deer_{E}_it{N}.ckpt``
    (mid-epoch, --save_every_iter).  An end-of-epoch ckpt outranks any
    mid-epoch save of the same epoch; later iters outrank earlier."""
    if not os.path.isdir(run_dir):
        return None
    best, best_key = None, (-1, 0, -1)
    for fn in os.listdir(run_dir):
        m = re.match(pattern, fn)
        if not m:
            continue
        ep = int(m.group(1))
        it = m.group(2)
        key = (ep, 0, int(it)) if it is not None else (ep, 1, 0)
        if key > best_key:
            best_key = key
            best = os.path.join(run_dir, fn)
    return best
