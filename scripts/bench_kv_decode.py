"""Same-process A/B: KV-cached vs full-recompute greedy decode on long
few-shot VL prompts (VERDICT r2 item 10).

The recompute generator (eval/vl_eval.make_greedy_generate) re-runs the
decoder over the whole token buffer for every new token — O(S^2 * new) —
which is optimal for the tiny CALVIN prompts but loses once few-shot
prompts grow.  The KV engine (eval/kv_decode.py) prefills per-layer K/V
once and decodes each token against the cache.  The harness default
(decode_engine="auto", eval/eval_models.py) switches on buffer length;
this script records the measured crossover evidence at S>=128.

Measurement per CLAUDE.md: distinct vision + token ids per iteration
(runtime dedupe), engines interleaved R,K,R,K with best-of per engine
(time-shared chip), and both generators return HOST tokens per call so
every timed window ends at a real readback.

Usage: python scripts/bench_kv_decode.py [--model mpt_dolly_3b]
         [--s 128] [--new 16] [--iters 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mpt_dolly_3b")
    ap.add_argument("--s", type=int, default=128, help="prompt tokens")
    ap.add_argument("--new", type=int, default=16, help="generated tokens")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.kv_decode import (greedy_generate_cached,
                                             supports_kv_cache)
    from deer_vla_tpu.eval.vl_eval import greedy_generate
    from deer_vla_tpu.models.flamingo import init_deer

    cfg = (MODEL_REGISTRY[args.model](max_layer=12)
           if args.model != "tiny" else MODEL_REGISTRY["tiny"]())
    assert supports_kv_cache(cfg), "config outside the KV engine envelope"
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    B, S, hw = args.batch, args.s, cfg.vit.image_size
    r = np.random.RandomState(0)
    n_runs = 2 * (args.iters + 1)  # per engine: 1 warmup + iters, 2 engines

    def fresh_inputs(i):
        """Distinct prompt + image per run (dedupe protection)."""
        rr = np.random.RandomState(1000 + i)
        ids = rr.randint(5, cfg.mpt.vocab_size - 5, (B, S)).astype(np.int32)
        ids[:, 0] = cfg.media_token_id
        mask = np.ones((B, S), np.int32)
        vis = jnp.asarray(rr.randn(B, 1, 1, 3, hw, hw), jnp.float32)
        return vis, ids, mask

    inputs = [fresh_inputs(i) for i in range(2 * n_runs)]

    def run(gen, pool):
        # warmup (compile) on the first input, then timed iters; the
        # generators return host numpy tokens => honest per-call sync
        out = gen(params, cfg, *pool[0], max_new_tokens=args.new)
        t0 = time.perf_counter()
        for i in range(1, 1 + args.iters):
            out = gen(params, cfg, *pool[i], max_new_tokens=args.new)
        dt = (time.perf_counter() - t0) / args.iters
        assert np.asarray(out).shape[-1] >= args.new // 2  # eos may cut
        return dt

    # interleave R,K,R,K; best-of-2 per engine (chip weather)
    t_re = run(greedy_generate, inputs[:n_runs])
    t_kv = run(greedy_generate_cached, inputs[n_runs:])
    t_re = min(t_re, run(greedy_generate, inputs[:n_runs]))
    t_kv = min(t_kv, run(greedy_generate_cached, inputs[n_runs:]))

    res = {
        "model": args.model, "prompt_tokens": S, "new_tokens": args.new,
        "recompute_s_per_gen": round(t_re, 3),
        "kv_cache_s_per_gen": round(t_kv, 3),
        "recompute_tokens_per_sec": round(args.new / t_re, 2),
        "kv_cache_tokens_per_sec": round(args.new / t_kv, 2),
        "kv_speedup": round(t_re / t_kv, 3),
        "auto_default_routes_to": ("kv_cache" if S + args.new >= 48
                                   else "recompute"),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
