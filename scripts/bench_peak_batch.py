"""Batch-size sweep at the one-chip PEAK serving composition (tome8 +
gripper_res 84 + int8 w8a8 on the while-loop engine, 3B).

Hypothesis: the exact-tower sweet spot was B=32 (235 a/s; 206 @ 64,
198 @ 128 — ROADMAP round-2 sweep), but the peak composition cuts
per-action compute ~3x, so the fixed per-dispatch cost is a larger share
of the step and a LARGER batch may now amortize it better — potentially
raising the one-chip peak beyond the measured 587-680 a/s at B=32.

Measurement discipline (CLAUDE.md): one process, one quantized stacked
tree shared by every program; a DISTINCT static image for every dispatch
(the runtime dedupes bit-identical repeat dispatches); steps chained
through the on-device carry; block on ALL outputs once per timed window;
per-B results printed incrementally (a tunnel drop keeps finished rows).
Full-depth thresholds (worst case — every stream runs all exits).

Usage: python scripts/bench_peak_batch.py [--batches 32,48,64,96,128]
       [--iters 10] [--quantize int8_w8a8] [--tome_r 8] [--res 84]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,48,64,96,128")
    ap.add_argument("--iters", type=int, default=10)
    # >= 1: the post-warm block_until_ready references the warm loop's
    # outputs (and warm 0 would time compile inside the measured loop)
    ap.add_argument("--warm", type=lambda v: max(1, int(v)), default=3)
    ap.add_argument("--model", default="mpt_dolly_3b")
    ap.add_argument("--quantize", default="int8_w8a8")
    ap.add_argument("--tome_r", type=int, default=8)
    ap.add_argument("--res", type=int, default=84)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.flops import full_step_flops
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy, build_scan_step
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.ops.lstm import zero_carry
    from deer_vla_tpu.ops.quant import quantize_serving_stacked

    cfg = MODEL_REGISTRY[args.model](max_layer=12)
    exits = list(cfg.all_exit_ids())
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits))
    del params
    stacked = (quantize_serving_stacked(pol.stacked, args.quantize)
               if args.quantize else pol.stacked)

    cfg_p = dataclasses.replace(
        cfg, gripper_res=args.res or None,
        vit=dataclasses.replace(cfg.vit, tome_r=args.tome_r))
    step = build_scan_step(cfg_p, exits, "L2", None)[0]
    gflops = full_step_flops(cfg_p, exits[-1])

    # full-depth per-layer threshold row via the engine's own layout
    # builder (scan_policy.threshold_row is the single source of the
    # row-layout invariant)
    full_depth = [-1e8] * (len(exits) - 1) + [1e30]
    th = jnp.asarray(pol.threshold_row(full_depth), jnp.float32)

    hw, s = cfg.vit.image_size, cfg.text_len
    ghw = args.res or hw
    r = np.random.RandomState(0)
    out = {"config": {"quantize": args.quantize, "tome_r": args.tome_r,
                      "gripper_res": args.res, "model": args.model,
                      "gflops_per_action_full": round(float(gflops), 1)}}
    for B in batches:
        ids = np.full((B, s), 11, np.int32)
        ids[:, 0] = cfg.media_token_id
        ids = jnp.asarray(ids)
        mask = jnp.ones((B, s), jnp.int32)
        grip = jnp.asarray(r.randn(B, 1, 1, 3, ghw, ghw), jnp.float32)
        pool = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
                for _ in range(args.iters + args.warm)]
        c = zero_carry(cfg.head.lstm_num_layers, B, cfg.head.hidden_size,
                       jnp.float32)
        t_compile0 = time.time()
        for i in range(args.warm):
            a, g, c, e = step(pol.params, stacked, pool[i], grip,
                              ids, mask, c, th)
        jax.block_until_ready((a, g, c, e))
        assert int(e[0]) == exits[-1], (int(e[0]), exits)
        compile_s = round(time.time() - t_compile0, 1)
        t0 = time.perf_counter()
        for i in range(args.warm, args.warm + args.iters):
            a, g, c, e = step(pol.params, stacked, pool[i], grip,
                              ids, mask, c, th)
        jax.block_until_ready((a, g, c, e))
        dt = (time.perf_counter() - t0) / args.iters
        out[f"B{B}"] = {
            "actions_per_sec": round(B / dt, 1),
            "step_ms": round(1000 * dt, 2),
            "ms_per_action": round(1000 * dt / B, 3),
            "warm_s": compile_s,
        }
        print(json.dumps({f"B{B}": out[f"B{B}"]}), flush=True)
        del pool, c, a, g, e, grip

    best = max(batches, key=lambda b: out[f"B{b}"]["actions_per_sec"])
    out["best_batch"] = best
    print(json.dumps(out))


if __name__ == "__main__":
    main()
