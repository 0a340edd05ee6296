"""Same-process A/B: w8a8 (int8 weights + int8 activations) vs w4a8
(--quantize int4_w8a8: nibble-packed int4 weights + int8 activations)
through the while-loop serving engine at 3B.

Both modes run the int8 MXU for every big matmul; w4a8 halves the weight
HBM bytes at the cost of an on-chip nibble unpack (two half-K dots,
ops/layers.linear s48 path).  Whether that trades profitably depends on
where the step sits on the roofline: B=1 is weight-bandwidth-bound (int4
bytes should win), B=32 is compute-bound (the unpack VPU work competes
with the MXU win).  Measurement discipline per CLAUDE.md:
  * ONE fp param tree; both quantized stacks derive from the same
    ScanDeerPolicy packing, so programs differ only in the weight layout;
  * per-depth timings are interleaved (w8a8, w4a8, w8a8, ...);
  * every dispatch consumes a DISTINCT image, chains through the
    on-device carry, and blocks on ALL outputs once at the end.

Usage: python scripts/bench_w4a8.py [--batch 32] [--iters 30]
       [--tome_r 8] [--gripper_res 84] [--model mpt_dolly_3b]
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--model", default="mpt_dolly_3b")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tome_r", type=int, default=0)
    ap.add_argument("--gripper_res", type=int, default=0)
    args = ap.parse_args()

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import exit_probs
    from deer_vla_tpu.ops.lstm import zero_carry
    from deer_vla_tpu.ops.quant import quantize_serving_stacked, tree_bytes

    cfg = MODEL_REGISTRY[args.model](max_layer=12)
    if args.tome_r:
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, tome_r=args.tome_r))
    if args.gripper_res:
        cfg = dataclasses.replace(cfg, gripper_res=args.gripper_res)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    exits = list(cfg.all_exit_ids())
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits))
    del params
    w8 = quantize_serving_stacked(pol.stacked, "int8_w8a8")
    w4 = quantize_serving_stacked(pol.stacked, "int4_w8a8")
    bytes_bf16 = tree_bytes(pol.stacked)
    bytes_w8, bytes_w4 = tree_bytes(w8), tree_bytes(w4)
    pol.stacked = None  # free the bf16 stack on device
    e8 = SimpleNamespace(params=pol.params, stacked=w8, _step=pol._step)
    e4 = SimpleNamespace(params=pol.params, stacked=w4, _step=pol._step)

    B, s = args.batch, cfg.text_len
    hw = cfg.vit.image_size
    gres = args.gripper_res or hw
    r = np.random.RandomState(0)
    N_POOL = 40
    pool = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(N_POOL)]
    grip = jnp.asarray(r.randn(B, 1, 1, 3, gres, gres), jnp.float32)
    ids = np.full((B, s), 11, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((B, s), jnp.int32)

    def full_thresholds(k):
        th = np.full(cfg.n_layers, -1e30, np.float32)
        for e in exits:
            th[e] = -1e8
        th[exits[k]] = 1e30
        return jnp.asarray(th)

    def time_depth(p, k, iters, warmup=5):
        th = full_thresholds(k)
        carry = zero_carry(cfg.head.lstm_num_layers, B, cfg.head.hidden_size,
                           jnp.float32)
        for i in range(warmup):
            arm, gp, carry, el = p._step(p.params, p.stacked,
                                         pool[i % N_POOL], grip, ids, mask,
                                         carry, th)
        jax.block_until_ready((arm, gp, carry, el))
        assert int(el[0]) == exits[k], (int(el[0]), exits[k])
        t0 = time.perf_counter()
        for i in range(iters):
            arm, gp, carry, el = p._step(p.params, p.stacked,
                                         pool[i % N_POOL], grip, ids, mask,
                                         carry, th)
        jax.block_until_ready((arm, gp, carry, el))
        return (time.perf_counter() - t0) / iters

    per_w8, per_w4 = [], []
    for k in range(len(exits)):
        per_w8.append(time_depth(e8, k, args.iters))
        per_w4.append(time_depth(e4, k, args.iters))
    per_w8, per_w4 = np.array(per_w8), np.array(per_w4)

    probs = exit_probs(len(exits), 0.8, "exp")
    t8 = float((probs * per_w8).sum())
    t4 = float((probs * per_w4).sum())
    out = {
        "batch": B,
        "tome_r": args.tome_r,
        "gripper_res": args.gripper_res,
        "stacked_mb": {"bf16": round(bytes_bf16 / 1e6, 1),
                       "w8a8": round(bytes_w8 / 1e6, 1),
                       "w4a8": round(bytes_w4 / 1e6, 1)},
        "per_depth_ms_w8a8": [round(1000 * t, 2) for t in per_w8],
        "per_depth_ms_w4a8": [round(1000 * t, 2) for t in per_w4],
        "dynamic_actions_per_sec_w8a8": round(B / t8, 2),
        "dynamic_actions_per_sec_w4a8": round(B / t4, 2),
        "speedup_w4a8_vs_w8a8": round(t8 / t4, 3),
        "full_depth_speedup": round(float(per_w8[-1] / per_w4[-1]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
