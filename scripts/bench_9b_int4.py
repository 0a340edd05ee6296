"""Truncated-9B (DeeR-B on MPT-7B, 12 layers) int4 serving on ONE 16 GB
chip: the bf16 stacked tree (~5.5 GB) leaves no HBM for the batched-32
engine's temps, so batched 9B serving was previously impossible here —
nibble-packed int4 (~1.4 GB) makes it fit.

Phases (one process, adjacent, per CLAUDE.md measurement rules):
  1. single-stream per-depth sweep, bf16 vs the first quant mode interleaved
     (speed + action drift at 9B scale);
  2. free the bf16 tree, compile the batched-32 program per quant mode,
     sweep depths -> batched 9B throughput numbers on this chip;
  3. optional --stack: tome8 + grip84 on the same quantized tree(s)
     (one-chip peak configuration at 9B).

HBM budget: phase 1 holds the ~5.5 GB bf16 stacked tree plus ONE quantized
tree (modes[0]); the remaining modes are quantized only after the bf16 tree
is freed.  For multi-mode runs --skip_ab drops the bf16 tree cost entirely.

--mode takes a comma-list and interleaves the batched per-depth timings
across modes in one process (same-process A/B): at truncated 9B both the
w8a8 tree (~2.8 GB) and the w4a8 tree (~1.4 GB) fit once the bf16 tree is
freed, so the 3B verdict (w8a8 wins the compute-bound batched step, w4a8
trades bytes for nibble-unpack VPU work) can be re-checked at 9B scale.

Usage: python scripts/bench_9b_int4.py [--iters 20] [--batch 32] [--stack]
       [--skip_ab] [--mode int8_w8a8,int4_w8a8]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stack", action="store_true",
                    help="also time tome8+grip84 on the int4 tree at batch")
    ap.add_argument("--skip_ab", action="store_true",
                    help="skip the single-stream bf16/int4 A/B (HBM + time)")
    ap.add_argument("--mode", default="int4",
                    help="comma-list of quant modes for the batched phases "
                         "(int4, int4_w8a8, int8_w8a8, int8); the first is "
                         "also the single-stream A/B mode.  int4 = "
                         "weight-only (bandwidth lever, B=1); int4_w8a8 = "
                         "int4 weights + int8 activations (~1.4 GB tree); "
                         "int8_w8a8 = int8 weights + int8 activations "
                         "(~2.8 GB at truncated 9B — fits without the bf16 "
                         "tree, and won the 3B batched A/B over w4a8).  "
                         "Multiple modes share one process and interleave "
                         "per depth (same-process A/B per CLAUDE.md)")
    args = ap.parse_args()

    # fail fast on a typo'd mode — BEFORE the expensive 9B init over the
    # slow axon tunnel (quantize_serving_stacked would only raise at line
    # ~90 otherwise)
    from deer_vla_tpu.ops.quant import QUANT_MODES
    modes = [m.strip() for m in args.mode.split(",") if m.strip()]
    bad = [m for m in modes if m not in QUANT_MODES]
    if bad or not modes:
        ap.error(f"--mode got {bad or ['(empty)']}; want a comma-list from "
                 f"{QUANT_MODES}")

    from deer_vla_tpu.core.config import DTypePolicy, MODEL_REGISTRY
    from deer_vla_tpu.eval.flops import full_step_flops
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy, build_scan_step
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import exit_probs
    from deer_vla_tpu.ops.lstm import zero_carry
    from deer_vla_tpu.ops.quant import quantize_serving_stacked

    cfg = MODEL_REGISTRY["mpt_9b"](
        max_layer=12,
        dtypes=DTypePolicy(param_dtype="bfloat16", compute_dtype="bfloat16"))
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    exits = list(cfg.all_exit_ids())
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits))
    del params
    # HBM discipline for multi-mode runs: only modes[0] is quantized while
    # the ~5.5 GB bf16 tree is live (the single-stream A/B needs both);
    # the remaining modes are quantized just before the bf16 tree is freed
    q_stacks = {modes[0]: quantize_serving_stacked(pol.stacked, modes[0])}
    q4 = SimpleNamespace(params=pol.params, stacked=q_stacks[modes[0]],
                         _step=pol._step)

    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    N_POOL = 40
    ids1 = np.full((1, s), 11, np.int32)
    ids1[:, 0] = cfg.media_token_id

    def make_inputs(B):
        pool = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
                for _ in range(N_POOL)]
        grip = jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
        ids = jnp.asarray(np.repeat(ids1, B, axis=0))
        mask = jnp.ones((B, s), jnp.int32)
        return pool, grip, ids, mask

    def full_thresholds(k):
        th = np.full(cfg.n_layers, -1e30, np.float32)
        for e in exits:
            th[e] = -1e8
        th[exits[k]] = 1e30
        return jnp.asarray(th)

    def time_depth(p, B, pool, grip, ids, mask, k, iters, warmup=4,
                   ret_act=False):
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
        dt = (time.perf_counter() - t0) / iters
        return (dt, np.asarray(arm)) if ret_act else dt

    probs = exit_probs(len(exits), 0.8, "exp")
    out = {"model": "mpt_9b_truncated12", "batch": args.batch,
           "mode": args.mode}

    if not args.skip_ab:
        pool1, grip1, idsA, maskA = make_inputs(1)
        per_bf, per_q4, drift = [], [], 0.0
        for k in range(len(exits)):
            tb, ab = time_depth(pol, 1, pool1, grip1, idsA, maskA, k,
                                args.iters, ret_act=True)
            tq, aq = time_depth(q4, 1, pool1, grip1, idsA, maskA, k,
                                args.iters, ret_act=True)
            per_bf.append(tb)
            per_q4.append(tq)
            drift = max(drift, float(np.max(np.abs(ab - aq))))
        per_bf, per_q4 = np.array(per_bf), np.array(per_q4)
        out["single_stream"] = {
            "per_depth_ms_bf16": [round(1000 * t, 2) for t in per_bf],
            "per_depth_ms_int4": [round(1000 * t, 2) for t in per_q4],
            "dynamic_aps_bf16": round(1.0 / float((probs * per_bf).sum()), 2),
            "dynamic_aps_int4": round(1.0 / float((probs * per_q4).sum()), 2),
            "int4_speedup": round(float((probs * per_bf).sum())
                                  / float((probs * per_q4).sum()), 3),
            "int4_action_max_drift": round(drift, 5),
        }
        print(json.dumps({"single_stream": out["single_stream"]}),
              flush=True)
        del pool1

    # quantize the remaining modes now (they must be sourced from the bf16
    # tree); the overlap window holds no B=32 temps, so bf16 + all quant
    # trees fits — then free the bf16 tree + its programs: batched-32 at 9B
    # doesn't fit alongside it (5.5 GB + quantized stacks + B=32 temps)
    for m in modes[1:]:
        q_stacks[m] = quantize_serving_stacked(pol.stacked, m)
    del pol
    jax.clear_caches()
    step_b = build_scan_step(cfg, exits, "L2", None)[0]
    engines = {m: SimpleNamespace(params=q4.params, stacked=q_stacks[m],
                                  _step=step_b) for m in modes}

    B = args.batch
    poolB, gripB, idsB, maskB = make_inputs(B)
    # per-depth timings interleaved across modes (same-process A/B: the
    # chip is time-shared, so adjacent dispatches see the same weather)
    per = {m: [] for m in modes}
    for k in range(len(exits)):
        for m in modes:
            per[m].append(time_depth(engines[m], B, poolB, gripB, idsB,
                                     maskB, k, args.iters))
    for m in modes:
        per_b = np.array(per[m])
        eB = float((probs * per_b).sum())
        out[f"batched_{m}"] = {
            "per_depth_ms": [round(1000 * t, 2) for t in per_b],
            "dynamic_actions_per_sec": round(B / eB, 2),
            "full_depth_actions_per_sec": round(B / float(per_b[-1]), 2),
            "gflops_per_action_full":
                round(full_step_flops(cfg, exits[-1]), 1),
        }
        print(json.dumps({f"batched_{m}": out[f"batched_{m}"]}), flush=True)

    if args.stack and 84 % cfg.vit.patch_size == 0:
        cfg_p = dataclasses.replace(
            cfg, gripper_res=84, vit=dataclasses.replace(cfg.vit, tome_r=8))
        step_p = build_scan_step(cfg_p, exits, "L2", None)[0]
        gripP = jnp.asarray(r.randn(B, 1, 1, 3, 84, 84), jnp.float32)
        per_s = {m: [] for m in modes}
        for k in range(len(exits)):
            for m in modes:
                pk = SimpleNamespace(params=q4.params, stacked=q_stacks[m],
                                     _step=step_p)
                per_s[m].append(time_depth(pk, B, poolB, gripP, idsB, maskB,
                                           k, args.iters))
        for m in modes:
            per_p = np.array(per_s[m])
            eP = float((probs * per_p).sum())
            out[f"batched_{m}_tome8_grip84"] = {
                "per_depth_ms": [round(1000 * t, 2) for t in per_p],
                "dynamic_actions_per_sec": round(B / eP, 2),
                "full_depth_actions_per_sec": round(B / float(per_p[-1]), 2),
                "gflops_per_action_full":
                    round(full_step_flops(cfg_p, exits[-1]), 1),
            }
            # incremental like the batched phase: a tunnel drop or OOM
            # mid-sweep must not lose the stacked timings already taken
            print(json.dumps({f"batched_{m}_tome8_grip84":
                              out[f"batched_{m}_tome8_grip84"]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
