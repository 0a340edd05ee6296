"""AOT export of the fused dynamic-exit serving step (jax.export).

The reference's deployment story is a Python checkpoint load through the
full model stack (eval_calvin.py:543-577) — every serving host needs the
model code, torch, and a warm trace.  TPU-native serving wants an
ahead-of-time artifact: here the while-loop engine's fused step
(eval/scan_policy.build_scan_step) is lowered once to StableHLO and
serialized; a serving host deserializes the bytes and runs them against
checkpoint weights without ever tracing Python model code.  Cross-platform
lowering means a CPU dev box can emit a TPU artifact.

Artifact layout: ``<path>`` (serialized jax.export bytes) +
``<path>.json`` (DeerConfig echo, batch/window geometry, exit ids,
argument order) — the same sidecar idea as train/checkpoint.py.

Weights stay OUT of the artifact: the exported program takes the packed
serving param trees as arguments, so one artifact serves every checkpoint
of the same config, and weight updates don't invalidate the program.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy


# custom pytree containers crossing the artifact boundary (carry types)
# must be registered with jax.export's serializer; idempotent-guarded so
# repeated imports/reloads don't raise
def _register_carry_types():
    from deer_vla_tpu.models.alt_heads import GPTCarry
    try:
        jax.export.register_namedtuple_serialization(
            GPTCarry, serialized_name="deer_vla_tpu.GPTCarry")
    except ValueError:
        pass  # already registered


_register_carry_types()


def _specs(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree)


def _arg_shapes(policy: ScanDeerPolicy, batch_size: int):
    """Abstract argument values for the fused step, in signature order
    (params, stacked, img, grip, ids, mask, carry, thresholds, state)."""
    cfg = policy.cfg
    enc_w = (cfg.window_size
             if (cfg.fusion_mode == "vit_concat" or cfg.use_hist) else 1)
    rows = batch_size * enc_w
    text_rows = rows if cfg.use_hist else batch_size
    hw = cfg.vit.image_size
    ghw = cfg.gripper_res or hw  # native-res gripper tower
    img = jax.ShapeDtypeStruct((rows, 1, 1, 3, hw, hw), jnp.float32)
    grip = jax.ShapeDtypeStruct((rows, 1, 1, 3, ghw, ghw), jnp.float32)
    ids = jax.ShapeDtypeStruct((text_rows, cfg.text_len), jnp.int32)
    mask = jax.ShapeDtypeStruct((text_rows, cfg.text_len), jnp.int32)
    from deer_vla_tpu.models.heads import any_zero_carry
    carry = _specs(any_zero_carry(cfg, batch_size))
    th = jax.ShapeDtypeStruct((cfg.n_layers,), jnp.float32)
    state = None
    if cfg.use_state or cfg.head.use_state:
        state = jax.ShapeDtypeStruct((rows, 1, 1, cfg.state_dim), jnp.float32)
    return (_specs(policy.params), _specs(policy.stacked), img, grip, ids,
            mask, carry, th, state)


def export_policy(params: dict, cfg: DeerConfig, *, batch_size: int = 1,
                  platforms: Tuple[str, ...] = ("tpu",),
                  threshold_type: str = "L2",
                  max_layer: Optional[int] = None,
                  exit_ids: Optional[List[int]] = None,
                  quantize: Optional[str] = None,
                  return_policy: bool = False):
    """Lower the fused dynamic-exit step to a serialized artifact.

    Returns (blob: bytes, meta: dict).  ``platforms`` may include platforms
    other than the current one (cross-lowering); a loaded artifact runs on
    any platform it was exported for.  ``quantize="int8"`` bakes the
    weight-only int8 stacked layout (ops/quant.py) into the program's
    argument shapes — the artifact then expects int8 stacks and the host
    side (ExportedScanPolicy) quantizes the checkpoint to match.
    """
    policy = ScanDeerPolicy(params, cfg, exit_ids=exit_ids,
                            threshold_type=threshold_type,
                            max_layer=max_layer, quantize=quantize)
    args = _arg_shapes(policy, batch_size)
    exp = jax.export.export(policy._step, platforms=list(platforms))(*args)
    blob = exp.serialize()
    meta = {
        "config": json.loads(cfg.to_json()),
        "batch_size": batch_size,
        "platforms": list(platforms),
        "threshold_type": threshold_type,
        "max_layer": max_layer,
        "quantize": quantize,
        "exits": [int(e) for e in policy.exits],
        "arg_order": ["params", "stacked", "image", "gripper", "input_ids",
                      "attention_mask", "carry", "thresholds_full", "state"],
        "jax_version": jax.__version__,
    }
    if return_policy:  # for save_bundle: the packed trees just exported
        return blob, meta, policy
    return blob, meta


def save_exported(path: str, blob: bytes, meta: dict) -> None:
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_exported(path: str):
    """Returns (jax.export.Exported, meta dict)."""
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())
    with open(path + ".json") as f:
        meta = json.load(f)
    return exp, meta


# ---------------------------------------------------------------------------
# self-contained bundles: artifact + the exact packed weight trees
# ---------------------------------------------------------------------------
#
# ExportedScanPolicy still rebuilds the weight trees from a checkpoint
# (init_deer + overlay + stacking) — model-building Python.  A BUNDLE ships
# the policy's packed (params, stacked) trees next to the artifact so a
# serving host reconstructs the EXACT argument pytrees (the AOT program
# validates treedefs strictly — tuple vs list matters, hence the explicit
# structure spec instead of msgpack's container coercion).


def _flatten_with_spec(node, leaves: list):
    if node is None:
        return {"t": "none"}
    if isinstance(node, dict):
        return {"t": "dict",
                "items": {k: _flatten_with_spec(v, leaves)
                          for k, v in node.items()}}
    if isinstance(node, (list, tuple)):
        t = "list" if isinstance(node, list) else "tuple"
        if hasattr(node, "_fields"):  # namedtuple carries never ship in
            raise TypeError(f"unsupported container {type(node)} in bundle")
        return {"t": t,
                "items": [_flatten_with_spec(v, leaves) for v in node]}
    leaves.append(np.asarray(node))
    return {"t": "leaf", "i": len(leaves) - 1}


def _rebuild_from_spec(spec, leaves):
    t = spec["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _rebuild_from_spec(v, leaves)
                for k, v in spec["items"].items()}
    if t == "list":
        return [_rebuild_from_spec(v, leaves) for v in spec["items"]]
    if t == "tuple":
        return tuple(_rebuild_from_spec(v, leaves) for v in spec["items"])
    return jnp.asarray(leaves[str(spec["i"])])


def save_bundle(path: str, blob: bytes, meta: dict, policy) -> None:
    """Artifact + meta (save_exported) + ``<path>.weights`` holding the
    policy's packed (params, stacked) argument trees."""
    from flax import serialization
    save_exported(path, blob, meta)
    leaves: list = []
    spec = {"params": _flatten_with_spec(policy.params, leaves),
            "stacked": _flatten_with_spec(policy.stacked, leaves)}
    payload = {"spec": json.dumps(spec),
               "leaves": {str(i): x for i, x in enumerate(leaves)}}
    with open(path + ".weights", "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


class BundledScanPolicy(ScanDeerPolicy):
    """The fully self-contained serving host: AOT program + packed weight
    trees from a bundle — no checkpoint, no init_deer, no tracing.  Shares
    every host-side method with ScanDeerPolicy (stepping, thresholds,
    stage reuse, postprocess); only construction differs."""

    def __init__(self, path: str, steps_per_stage: int = 1):
        from flax import serialization

        from deer_vla_tpu.core.config import DeerConfig
        exp, meta = load_exported(path)
        with open(path + ".weights", "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        spec = json.loads(payload["spec"])
        self.params = _rebuild_from_spec(spec["params"], payload["leaves"])
        self.stacked = _rebuild_from_spec(spec["stacked"], payload["leaves"])
        self.cfg = DeerConfig.from_json(json.dumps(meta["config"]))
        self.exits = [int(e) for e in meta["exits"]]
        self.quantize = meta.get("quantize")
        self.meta = meta
        self._step = exp.call
        self.steps_per_stage = steps_per_stage
        self.cur_step = 0
        self.set_thresholds([1e8] * len(self.exits))
        self.last_exit_layer = -1
        self.reset()


class ExportedScanPolicy(ScanDeerPolicy):
    """ScanDeerPolicy whose fused step comes from a deserialized artifact —
    the serving-host side.  The Python engine code is still used for the
    cheap host logic (carry management, threshold staging, postprocess);
    the model program itself is the AOT StableHLO, so no retrace can ever
    change what runs in production."""

    def __init__(self, artifact_path: str, params: dict, cfg: DeerConfig,
                 **kw):
        exp, meta = load_exported(artifact_path)
        # the artifact's argument layout is authoritative: an int8 export
        # needs the host to quantize the checkpoint stacks identically
        kw.setdefault("quantize", meta.get("quantize"))
        if kw.get("quantize") != meta.get("quantize"):
            raise ValueError(
                f"artifact was exported with quantize={meta.get('quantize')!r}"
                f" but the host requested {kw.get('quantize')!r}")
        super().__init__(params, cfg, **kw)
        if [int(e) for e in self.exits] != list(meta["exits"]):
            raise ValueError(
                f"artifact exits {meta['exits']} != config exits "
                f"{self.exits} — wrong checkpoint/config for this artifact")
        self._step = exp.call
        self.meta = meta
