"""Same-process A/B: exact ViT-L tower vs ToMe token merging (--vit_tome_r)
through the while-loop serving engine at 3B.

ToMe (ops/tome.py) cuts the dominant vision-encode FLOPs; this measures what
that buys end-to-end on the real chip.  Measurement discipline per CLAUDE.md:
  * both engines share ONE stacked weight tree (ToMe is weight-free), so the
    A/B fits HBM and compares programs, not allocation luck;
  * per-depth timings are interleaved (exact, tome, exact, tome ...) because
    the chip is time-shared — only adjacent same-process ratios mean anything;
  * every dispatch consumes a DISTINCT image (the runtime dedupes bit-identical
    repeat dispatches) and chains through the on-device carry, blocking on ALL
    outputs once at the end.

Usage: python scripts/bench_tome.py [--r 8] [--iters 30]
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
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--model", default="mpt_dolly_3b")
    ap.add_argument("--batch", type=int, default=1,
                    help="streams per dispatch (32 = batched serving A/B)")
    ap.add_argument("--quantize", default="",
                    help="int8 | int8_w8a8: quantize the SHARED stacked "
                         "tree so both engines run quantized (measures "
                         "tome x quantization stacking)")
    args = ap.parse_args()

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.flops import full_step_flops
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy, build_scan_step
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import exit_probs
    from deer_vla_tpu.ops.lstm import zero_carry

    cfg = MODEL_REGISTRY[args.model](max_layer=12)
    cfg_tome = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, tome_r=args.r))
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    exits = list(cfg.all_exit_ids())
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits),
                         quantize=args.quantize or None)
    del params
    # ToMe engine shares the SAME packed weights; only the program differs
    step_t = build_scan_step(cfg_tome, exits, "L2", None)[0]
    tome = SimpleNamespace(params=pol.params, stacked=pol.stacked,
                           _step=step_t)

    B, hw, s = args.batch, cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    N_POOL = 40
    pool = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(N_POOL)]
    grip = jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
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

    per_exact, per_tome = [], []
    for k in range(len(exits)):
        per_exact.append(time_depth(pol, k, args.iters))
        per_tome.append(time_depth(tome, k, args.iters))
    per_exact, per_tome = np.array(per_exact), np.array(per_tome)

    probs = exit_probs(len(exits), 0.8, "exp")
    te = float((probs * per_exact).sum())
    tt = float((probs * per_tome).sum())
    g_exact = full_step_flops(cfg, exits[0])
    g_tome = full_step_flops(cfg_tome, exits[0])
    out = {
        "r": args.r,
        "batch": B,
        "quantize": args.quantize or "bf16",
        "per_depth_ms_exact": [round(1000 * t, 2) for t in per_exact],
        "per_depth_ms_tome": [round(1000 * t, 2) for t in per_tome],
        "dynamic_actions_per_sec_exact": round(B / te, 2),
        "dynamic_actions_per_sec_tome": round(B / tt, 2),
        "speedup": round(te / tt, 3),
        "full_depth_speedup": round(float(per_exact[-1] / per_tome[-1]), 3),
        "exit1_gflops_exact": round(g_exact, 1),
        "exit1_gflops_tome": round(g_tome, 1),
        "analytic_flops_ratio": round(g_tome / g_exact, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
