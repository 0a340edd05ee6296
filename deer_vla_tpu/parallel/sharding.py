"""Parameter/batch sharding rules over the (dp, fsdp, tp) mesh.

Replaces the reference's FSDP machinery (open_flamingo flamingo.py:202-301
manual double-wrap; train.py:310-350 FULL/HYBRID shard; the 1741-line
_optim_utils.py optimizer-state patch): with pjit, sharded parameters and
sharded Adam state fall out of the same PartitionSpec tree and XLA inserts
the all-gathers/reduce-scatters.

Rules:
  * fsdp: every float leaf with >= min_size elements is sharded on its
    largest divisible dimension (ZeRO-3 style).
  * tp (9B option): attention Wqkv/out_proj and MLP up/down are sharded on
    head/ffn dims across 'tp' (Megatron layout); everything else replicated
    across tp.
  * batch: leading dim over (dp, fsdp) — HYBRID_SHARD-like semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_TP_ROWS = ("wqkv", "mlp_up", "to_q", "to_kv")   # shard output dim
_TP_COLS = ("out_proj", "mlp_down", "to_out")    # shard input dim


def _leaf_spec(path_str: str, shape, mesh: Mesh, *, fsdp: bool, tp: bool,
               min_size: int) -> P:
    ndim = len(shape)
    spec = [None] * ndim
    tp_n = mesh.shape["tp"]
    fsdp_n = mesh.shape["fsdp"]

    if tp and tp_n > 1 and ndim == 2:
        if any(f"'{k}'" in path_str for k in _TP_ROWS) and shape[1] % tp_n == 0:
            spec[1] = "tp"
        elif any(f"'{k}'" in path_str for k in _TP_COLS) and shape[0] % tp_n == 0:
            spec[0] = "tp"

    if fsdp and fsdp_n > 1 and int(np.prod(shape)) >= min_size:
        # shard the largest dim not already taken by tp
        order = sorted(range(ndim), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % fsdp_n == 0:
                spec[i] = "fsdp"
                break
    return P(*spec)


def param_shardings(params, mesh: Mesh, *, fsdp: bool = True, tp: bool = False,
                    min_size: int = 2 ** 16):
    """NamedSharding pytree matching ``params``."""
    def one(path, leaf):
        ps = jax.tree_util.keystr(path)
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _leaf_spec(ps, leaf.shape, mesh,
                                              fsdp=fsdp, tp=tp,
                                              min_size=min_size))
    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh, **kw):
    shardings = param_shardings(params, mesh, **kw)
    return jax.device_put(params, shardings), shardings


def shard_batch(batch, mesh: Mesh):
    s = NamedSharding(mesh, P(("dp", "fsdp")))
    rep = NamedSharding(mesh, P())
    def one(x):
        if hasattr(x, "shape") and x.ndim >= 1 and \
                x.shape[0] % (mesh.shape["dp"] * mesh.shape["fsdp"]) == 0:
            return jax.device_put(x, s)
        return jax.device_put(x, rep)
    return jax.tree_util.tree_map(one, batch)
