"""Same-process A/B: fp(bf16) vs weight-only int8 while-loop serving at 3B.

Measurement rules per CLAUDE.md: distinct image every dispatch, carry
chained through on device, one sync at the end, A/B interleaved in the
same process (the chip is time-shared; only same-process ratios mean
anything).  Depths: first exit and full depth.

Usage: python scripts/bench_int8.py [--model mpt_dolly_3b] [--iters 20]
       [--indexed_mm]   # also exercise the Pallas q8 indexed kernel
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mpt_dolly_3b")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--indexed_mm", action="store_true")
    ap.add_argument("--modes", default="int8",
                    help="comma list of quant modes to A/B vs bf16 "
                         "(int8, int4, int8_w8a8)")
    args = ap.parse_args()

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.ops.lstm import zero_carry

    cfg = MODEL_REGISTRY[args.model](max_layer=12)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    engines = {"bf16": ScanDeerPolicy(params, cfg,
                                      indexed_mm=args.indexed_mm)}
    for mode in args.modes.split(","):
        engines[mode] = ScanDeerPolicy(params, cfg,
                                       indexed_mm=args.indexed_mm,
                                       quantize=mode)
    from deer_vla_tpu.ops.quant import tree_bytes
    print(json.dumps({k: {"stacked_mb": round(tree_bytes(p.stacked) / 2**20)}
                      for k, p in engines.items()}))

    exits = engines["bf16"].exits
    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    n_pool = args.iters + args.warmup
    imgs = [jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(n_pool)]
    grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)

    def full_th(k):
        th = np.full(cfg.n_layers, -1e30, np.float32)
        for e in exits:
            th[e] = -1e8
        th[exits[k]] = 1e30
        return jnp.asarray(th)

    def time_depth(policy, k):
        th = full_th(k)
        carry = zero_carry(cfg.head.lstm_num_layers, 1,
                           cfg.head.hidden_size, jnp.float32)
        for i in range(args.warmup):
            arm, gp, carry, el = policy._step(policy.params, policy.stacked,
                                              imgs[i], grip, ids, mask,
                                              carry, th)
        jax.block_until_ready((arm, gp, carry, el))
        assert int(el[0]) == exits[k], (int(el[0]), exits[k])
        t0 = time.perf_counter()
        for i in range(args.warmup, n_pool):
            arm, gp, carry, el = policy._step(policy.params, policy.stacked,
                                              imgs[i], grip, ids, mask,
                                              carry, th)
        jax.block_until_ready((arm, gp, carry, el))
        return (time.perf_counter() - t0) / args.iters, np.asarray(arm)

    out = {"model": args.model, "indexed_mm": args.indexed_mm,
           "backend": jax.default_backend()}
    # interleave A/B per depth so chip time-sharing hits both evenly
    for k, name in [(0, "first_exit"), (len(exits) - 1, "full_depth")]:
        t_fp, a_fp = time_depth(engines["bf16"], k)
        timed = {m: time_depth(engines[m], k)
                 for m in engines if m != "bf16"}
        t_fp2, _ = time_depth(engines["bf16"], k)
        t_fp = min(t_fp, t_fp2)
        out[name] = {"bf16_ms": round(1000 * t_fp, 2)}
        for m, (t_q, a_q) in timed.items():
            out[name][f"{m}_ms"] = round(1000 * t_q, 2)
            out[name][f"{m}_speedup"] = round(t_fp / t_q, 3)
            out[name][f"{m}_action_max_diff"] = round(
                float(np.abs(a_fp - a_q).max()), 4)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
