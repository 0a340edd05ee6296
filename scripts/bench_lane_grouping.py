"""Measured A/B: does exit-depth-affinity lane grouping shrink the
batched-exit waste at 32 lanes? (VERDICT r2 item 6)

The while-loop batch runs every stream to the dispatch's DEEPEST exit
(eval/scan_policy.py step docstring): at avg exit 5.74/12 (exp 0.8) a B=32
dispatch forfeits a large share of the early-exit FLOPs savings.  The
candidate mitigation: split the 32 lanes into G groups of streams with
similar expected depth so shallow groups stop early.

Variants (all dependency-chained across groups AND rounds, distinct images
per dispatch — the only measurement pattern that is meaningful on this
runtime, see CLAUDE.md):
  b32        one B=32 dispatch per round, mixed depths (today's policy)
  g8_rand    4 chained B=8 dispatches, lane order (control: smaller batch,
             no affinity — isolates dispatch overhead from grouping gain)
  g8_sorted  4 chained B=8 dispatches, streams sorted by THIS round's true
             depth (oracle affinity upper bound); includes the carry
             permute/scatter cost a real regrouping engine would pay
  g8_last    sorted by the PREVIOUS round's depth (the implementable
             policy; its value depends on the depth process's
             autocorrelation rho — synthetic AR here, --rho)

Depths are drawn per stream from the exp(exit_ratio=0.8) solver target
(models/value_net.exit_probs) with AR(rho) temporal persistence.

Timing realism note: the while_loop runs EVERY lane to the dispatch's max
depth regardless of per-stream rows (scan_policy.step docstring), so for
timing each dispatch forces its batch/group MAX depth through the 1D
runtime threshold vector — device-work-identical to per-stream rows, and
the only threshold variant whose chained timing verifies against a
post-block host readback on this tunnel (per-stream (B, n_layers)-row
programs returned non-physical 0.01 ms/action timings).  Per-stream exits
enter the analytic wasted-layer columns, which are exact.

Usage:  python scripts/bench_lane_grouping.py [--rounds 10] [--rho 0.7]
        [--model mpt_dolly_3b] [--groups 4]
Writes one JSON line per variant + a verdict line.
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
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--lanes", type=int, default=32)
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--rho", type=float, default=0.7,
                    help="AR persistence of the synthetic depth process")
    ap.add_argument("--exit_ratio", type=float, default=0.8)
    args = ap.parse_args()

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import exit_probs
    from deer_vla_tpu.ops.lstm import zero_carry

    cfg = (MODEL_REGISTRY[args.model](max_layer=12)
           if args.model != "tiny" else MODEL_REGISTRY["tiny"]())
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    policy = ScanDeerPolicy(params, cfg)
    del params
    exits = list(policy.exits)
    nl = cfg.n_layers
    B, G = args.lanes, args.groups
    assert B % G == 0
    gb = B // G
    T = args.rounds + args.warmup

    # synthetic AR(rho) depth process over the exp solver target
    probs = exit_probs(len(exits), args.exit_ratio, "exp")
    r = np.random.RandomState(0)
    depths = np.zeros((T, B), int)
    depths[0] = r.choice(len(exits), size=B, p=probs)
    for t in range(1, T):
        keep = r.rand(B) < args.rho
        depths[t] = np.where(keep, depths[t - 1],
                             r.choice(len(exits), size=B, p=probs))

    # one 1D forced-depth threshold vector per exit index (bench.py
    # full_thresholds), built once as constant device arrays
    def _row(k):
        out = np.full(nl, -1e30, np.float32)
        for e in exits:
            out[e] = -1e8
        out[exits[k]] = 1e30
        return jnp.asarray(out)
    th1d = [_row(k) for k in range(len(exits))]

    hw, s = cfg.vit.image_size, cfg.text_len
    rr = np.random.RandomState(1)
    # distinct image per (round, stream): runtime dedupe protection
    imgs = [jnp.asarray(rr.randn(B, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(T)]
    grip = jnp.asarray(rr.randn(B, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((B, s), 11, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((B, s), jnp.int32)

    def fresh_carry():
        return zero_carry(cfg.head.lstm_num_layers, B, cfg.head.hidden_size,
                          jnp.float32)

    def run_b32():
        """One B=32 dispatch per round.  Rounds are serialized through an
        INPUT dependency (next round's images depend on this round's action)
        — on this runtime a carry-only chain's block_until_ready returned
        in 0.003 ms/action while the subsequent readback took 44 s (the
        block lies); the timed window therefore ends at a real host
        readback, whose cost is reported as the sanity column."""
        carry = fresh_carry()
        out = None
        chain = jnp.float32(0)
        t0 = 0.0
        for t in range(T):
            if t == args.warmup:
                jax.block_until_ready((carry, out))
                if out is not None:
                    float(np.asarray(out[0]).sum())
                t0 = time.perf_counter()
            th = th1d[int(depths[t].max())]  # batch runs to its max depth
            arm, gp, carry, el = policy._step(policy.params, policy.stacked,
                                              imgs[t] + chain, grip, ids,
                                              mask, carry, th)
            chain = (el[0].astype(jnp.float32)
                     + arm.reshape(-1)[0].astype(jnp.float32)) * 0
            out = (arm, gp, el)
        jax.block_until_ready((carry, out))
        t1 = time.perf_counter()
        float(np.asarray(out[0]).sum())
        t2 = time.perf_counter()
        dt = (t2 - t0) / (args.rounds * B)
        return dt, 1000 * (t2 - t1)

    def run_grouped(order_of):
        """order_of(t) -> (B,) permutation; group g serves streams
        order[g*gb:(g+1)*gb].  Groups are serialized by a data dependency
        (a real single chip runs one program at a time; this runtime's
        backend pool would otherwise overlap independent dispatches and
        fake the numbers).  Carry rows are gathered per group and scattered
        back per round — the cost a real regrouping engine pays."""
        carry = fresh_carry()
        out = None
        chain = jnp.float32(0)
        t0 = 0.0
        for t in range(T):
            if t == args.warmup:
                jax.block_until_ready((carry, out))
                t0 = time.perf_counter()
            order = order_of(t)
            new_rows = []
            outs = []
            for g in range(G):
                idx = jnp.asarray(order[g * gb:(g + 1) * gb])
                ks = depths[t][order[g * gb:(g + 1) * gb]]
                th = th1d[int(ks.max())]  # group runs to ITS max depth
                img_g = jnp.take(imgs[t], idx, axis=0) + chain
                sub = tuple(jnp.take(c, idx, axis=1) for c in carry)
                arm, gp, sub, el = policy._step(
                    policy.params, policy.stacked, img_g,
                    jnp.take(grip, idx, axis=0), jnp.take(ids, idx, axis=0),
                    jnp.take(mask, idx, axis=0), sub, th)
                # the next group's images depend on this group's ACTION —
                # a full serialization barrier (arm, not just el)
                chain = (el[0].astype(jnp.float32)
                         + arm.reshape(-1)[0].astype(jnp.float32)) * 0
                new_rows.append(sub)
                outs.append((arm, gp, el))
            out = outs
            inv = jnp.asarray(np.argsort(order))
            carry = tuple(
                jnp.take(jnp.concatenate(parts, axis=1), inv, axis=1)
                for parts in zip(*new_rows))
        jax.block_until_ready((carry, out))
        t1 = time.perf_counter()
        float(np.asarray(out[-1][0]).sum())
        t2 = time.perf_counter()
        dt = (t2 - t0) / (args.rounds * B)
        return dt, 1000 * (t2 - t1)

    def waste_of(order_fn):
        w = 0.0
        for t in range(args.warmup, T):
            order = order_fn(t)
            for g in range(G):
                ks = depths[t][order[g * gb:(g + 1) * gb]]
                w += float(np.sum(exits[int(ks.max())]
                                  - np.asarray([exits[k] for k in ks])))
        return w / (args.rounds * B)

    ident = lambda t: np.arange(B)
    sort_now = lambda t: np.argsort(depths[t], kind="stable")
    sort_last = lambda t: np.argsort(depths[max(t - 1, 0)], kind="stable")

    b32_waste = 0.0
    for t in range(args.warmup, T):
        ks = depths[t]
        b32_waste += float(np.sum(exits[int(ks.max())]
                                  - np.asarray([exits[k] for k in ks])))
    b32_waste /= args.rounds * B

    results = {}
    variants = [
        ("b32", run_b32, lambda: b32_waste),
        ("g8_rand", lambda: run_grouped(ident), lambda: waste_of(ident)),
        ("g8_sorted", lambda: run_grouped(sort_now),
         lambda: waste_of(sort_now)),
        ("g8_last", lambda: run_grouped(sort_last),
         lambda: waste_of(sort_last)),
    ]
    for name, fn, wfn in variants:
        dt, read_ms = fn()
        results[name] = {"ms_per_action": round(1000 * dt, 3),
                         "actions_per_sec": round(1 / dt, 1),
                         "readback_sanity_ms": round(read_ms, 2),
                         "analytic_wasted_layers_per_action":
                             round(wfn(), 3)}
        print(json.dumps({name: results[name]}), flush=True)

    base = results["b32"]["ms_per_action"]
    best = min(results, key=lambda k: results[k]["ms_per_action"])
    print(json.dumps({
        "verdict": {
            "best": best,
            "speedup_vs_b32": round(
                base / results[best]["ms_per_action"], 3),
            "rho": args.rho, "groups": G, "lanes": B,
            "note": ("grouping pays only if the grouped variants beat b32 "
                     "after the extra per-dispatch overhead; g8_rand "
                     "isolates that overhead from the affinity gain"),
        }}), flush=True)


if __name__ == "__main__":
    main()
