"""Same-process A/B: 224-upsampled gripper tower (reference behavior) vs the
native-resolution gripper tower (--gripper_res 84) through the while-loop
serving engine at 3B.

The reference upsamples CALVIN's 84x84 wrist camera to 224 only because its
open_clip preprocess is fixed-res (robot_flamingo/models/factory.py:109-114);
cfg.gripper_res runs the shared ViT at the native grid instead (pos-embeds
interpolated, models/vit.resize_pos_embed), cutting dual-camera vision FLOPs
~43%.  Measurement discipline per CLAUDE.md:
  * both engines share ONE stacked weight tree (gripper_res is weight-free);
  * per-depth timings are interleaved (exact, native, exact, native ...);
  * every dispatch consumes a DISTINCT image, chains through the on-device
    carry, and blocks on ALL outputs once at the end.

Usage: python scripts/bench_gripper_res.py [--res 84] [--iters 30]
       [--batch 32] [--tome_r 8] [--quantize int8_w8a8]
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
    ap.add_argument("--res", type=int, default=84)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--model", default="mpt_dolly_3b")
    ap.add_argument("--batch", type=int, default=1,
                    help="streams per dispatch (32 = batched serving A/B)")
    ap.add_argument("--tome_r", type=int, default=0,
                    help="also merge static-camera tokens (measures "
                         "gripper_res x tome stacking; the native-res "
                         "gripper pass runs exact either way)")
    ap.add_argument("--quantize", default="",
                    help="int8 | int8_w8a8 | int4: quantize the SHARED "
                         "stacked tree so both engines run quantized")
    args = ap.parse_args()

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.flops import full_step_flops, vision_flops
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy, build_scan_step
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import exit_probs
    from deer_vla_tpu.ops.lstm import zero_carry

    cfg = MODEL_REGISTRY[args.model](max_layer=12)
    if args.tome_r:
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, tome_r=args.tome_r))
    cfg_nat = dataclasses.replace(cfg, gripper_res=args.res)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    exits = list(cfg.all_exit_ids())
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits),
                         quantize=args.quantize or None)
    del params
    # native-res engine shares the SAME packed weights; only the program
    # (and the gripper input shape) differs
    step_n = build_scan_step(cfg_nat, exits, "L2", None)[0]
    nat = SimpleNamespace(params=pol.params, stacked=pol.stacked,
                          _step=step_n)

    B, hw, s = args.batch, cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    N_POOL = 40
    pool = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(N_POOL)]
    grip224 = jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
    grip_nat = jnp.asarray(r.randn(B, 1, 1, 3, args.res, args.res),
                           jnp.float32)
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

    def time_depth(p, grip, k, iters, warmup=5):
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

    per_exact, per_nat = [], []
    for k in range(len(exits)):
        per_exact.append(time_depth(pol, grip224, k, args.iters))
        per_nat.append(time_depth(nat, grip_nat, k, args.iters))
    per_exact, per_nat = np.array(per_exact), np.array(per_nat)

    probs = exit_probs(len(exits), 0.8, "exp")
    te = float((probs * per_exact).sum())
    tn = float((probs * per_nat).sum())
    out = {
        "res": args.res,
        "batch": B,
        "tome_r": args.tome_r,
        "quantize": args.quantize or "bf16",
        "per_depth_ms_exact": [round(1000 * t, 2) for t in per_exact],
        "per_depth_ms_native": [round(1000 * t, 2) for t in per_nat],
        "dynamic_actions_per_sec_exact": round(B / te, 2),
        "dynamic_actions_per_sec_native": round(B / tn, 2),
        "speedup": round(te / tn, 3),
        "full_depth_speedup": round(float(per_exact[-1] / per_nat[-1]), 3),
        "exit1_gflops_exact": round(full_step_flops(cfg, exits[0]), 1),
        "exit1_gflops_native": round(full_step_flops(cfg_nat, exits[0]), 1),
        "analytic_vision_ratio": round(vision_flops(cfg_nat)
                                       / vision_flops(cfg), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
