"""Multi-chip batched serving: stream batch sharded over a device mesh.

The reference serves one stream per GPU process (eval sequences statically
sharded over ranks, eval_utils.py:521-527).  TPU-native scaling instead
runs MANY streams through ONE while-loop program whose batch dim is sharded
over the mesh's data-parallel axis: weights are replicated, each device
computes its local slice of the streams, and the exit predicate's
``all streams exited`` reduction is the only cross-chip collective (a
one-bit psum XLA inserts automatically from the sharded ``jnp.all``).

Composes with eval/batched_rollout.py: construct the policy, wrap it here
with a mesh, and the lanes' arrays are placed with batch shardings before
every dispatch — no other code changes (same .step_batch/.dispatch_batch
surface as ScanDeerPolicy).

Device-count notes: B must be divisible by the dp-axis size; the slowest
stream in the GLOBAL batch still gates the while_loop (the same
throughput-serving trade the single-chip batched step makes).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ShardedBatchedPolicy:
    """Wrap a ScanDeerPolicy so its batched step runs sharded over ``mesh``.

    Parameters are placed replicated ONCE; per-step inputs (images, text,
    carry, state) are placed with the batch dim sharded over ('dp',
    'fsdp').  The inner jitted step is reused verbatim — GSPMD partitions
    it from the argument shardings.
    """

    def __init__(self, inner, mesh: Mesh):
        from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
        assert isinstance(inner, ScanDeerPolicy), \
            "sharded serving wraps the while-loop engine"
        if inner.cfg.use_hist or inner.cfg.fusion_mode == "vit_concat":
            raise NotImplementedError(
                "sharded batched serving feeds one frame per stream; "
                "window-folded models use the single-stream windowed path")
        self.inner = inner
        self.cfg = inner.cfg
        self.mesh = mesh
        self.n_shards = mesh.shape["dp"] * mesh.shape["fsdp"]
        self._rep = NamedSharding(mesh, P())
        self._bsh = NamedSharding(mesh, P(("dp", "fsdp")))
        # params/stacked: replicate once, reuse across steps
        self._params = jax.device_put(inner.params, self._rep)
        self._stacked = jax.device_put(inner.stacked, self._rep)
        self.last_exit_layer = -1
        self.reset()

    def reset(self):
        self.inner.reset()
        self._carry = None

    def set_timestep(self, t: int):
        self.inner.set_timestep(t)

    def set_thresholds(self, thresholds):
        self.inner.set_thresholds(thresholds)

    def _place(self, x):
        return jax.device_put(x, self._bsh)

    def _ensure_carry(self, b: int):
        if self._carry is None:
            from deer_vla_tpu.ops.lstm import zero_carry
            import jax.numpy as jnp
            carry = zero_carry(self.cfg.head.lstm_num_layers, b,
                               self.cfg.head.hidden_size, jnp.float32)
            # carry leaves are (num_layers, B, H): batch on dim 1
            csh = NamedSharding(self.mesh, P(None, ("dp", "fsdp")))
            self._carry = jax.device_put(carry, csh)

    def reset_streams(self, stream_mask) -> None:
        """Per-stream episode reset — same contract as
        ScanDeerPolicy.reset_streams (eval/batched_rollout.py:126 calls
        this at every subtask begin); the refreshed carry keeps its
        batch sharding."""
        if self._carry is None:
            return
        import jax.numpy as jnp
        from deer_vla_tpu.ops.lstm import zero_carry
        m = jnp.asarray(np.asarray(stream_mask))
        fresh = zero_carry(self.cfg.head.lstm_num_layers, m.shape[0],
                           self.cfg.head.hidden_size, jnp.float32)
        csh = NamedSharding(self.mesh, P(None, ("dp", "fsdp")))
        self._carry = tuple(
            jax.device_put(jnp.where(m[None, :, None], f, c), csh)
            for f, c in zip(fresh, self._carry))

    def dispatch_batch(self, image, gripper, input_ids, attention_mask,
                       state: Optional[object] = None):
        """Async sharded step over B streams (B % mesh dp size == 0);
        returns device handles, convert with finish_batch."""
        b = input_ids.shape[0]
        assert b % self.n_shards == 0, \
            (f"stream batch {b} not divisible by the mesh's "
             f"{self.n_shards} data-parallel shards")
        self._ensure_carry(b)
        args = [self._place(x) for x in (image, gripper, input_ids,
                                         attention_mask)]
        st = self._place(state) if state is not None else None
        arm, grip, self._carry, exit_layer = self.inner._step(
            self._params, self._stacked, *args, self._carry,
            self.inner.thresholds, st)
        return arm, grip, exit_layer

    def finish_batch(self, handles):
        return self.inner.finish_batch(handles)

    def step_batch(self, image, gripper, input_ids, attention_mask,
                   state=None):
        out = self.dispatch_batch(image, gripper, input_ids, attention_mask,
                                  state)
        acts, exits = self.finish_batch(out)
        self.last_exit_layer = int(np.max(exits))
        return acts, exits
