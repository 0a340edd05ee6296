"""Same-process A/B: packed (pruned+stacked-encoder) vs full-arg-tree
while-loop step.  Measures the dispatch-marshaling win of pack=True at both
first-exit and full depth (device-pipelined)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=40, warmup=4):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def timeit_chained(step, params, stacked, img, grip, ids, mask, carry0, th,
                   iters=40, warmup=4):
    """Carry chained through iterations (true streaming dependency): steps
    cannot overlap even if the runtime parallelizes independent programs."""
    carry = carry0
    for _ in range(warmup):
        arm, gp, carry, el = step(params, stacked, img, grip, ids, mask,
                                  carry, th)
    jax.block_until_ready((arm, gp, carry, el))
    t0 = time.perf_counter()
    for _ in range(iters):
        arm, gp, carry, el = step(params, stacked, img, grip, ids, mask,
                                  carry, th)
    jax.block_until_ready((arm, gp, carry, el))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    model = sys.argv[1] if len(sys.argv) > 1 else "mpt_dolly_3b"
    cfg = MODEL_REGISTRY[model](max_layer=12)
    from deer_vla_tpu.models.flamingo import init_deer
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)

    from deer_vla_tpu.ops.lstm import zero_carry
    carry = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                       jnp.float32)

    results = {}
    for name, pack in (("packed", True), ("full", False)):
        pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * 6, pack=pack)
        n_leaves = len(jax.tree_util.tree_leaves(pol.params)) + \
            len(jax.tree_util.tree_leaves(pol.stacked))
        exits = pol.exits

        def th(k):
            t = np.full(cfg.n_layers, -1e30, np.float32)
            for e in exits:
                t[e] = -1e8
            t[exits[k]] = 1e30
            return jnp.asarray(t)

        for depth, label in ((0, "first"), (len(exits) - 1, "full_depth")):
            ms = timeit(pol._step, pol.params, pol.stacked, img, grip, ids,
                        mask, carry, th(depth))
            ms_c = timeit_chained(pol._step, pol.params, pol.stacked, img,
                                  grip, ids, mask, carry, th(depth))
            results[f"{name}_{label}"] = ms
            results[f"{name}_{label}_chained"] = ms_c
            print(f"{name:7s} {label:10s} leaves={n_leaves:4d}  "
                  f"indep={ms:7.3f} ms  chained={ms_c:7.3f} ms")

    for label in ("first", "full_depth"):
        for suff in ("", "_chained"):
            f = results[f"full_{label}{suff}"]
            p = results[f"packed_{label}{suff}"]
            print(f"speedup {label + suff:20s}: {f / p:5.2f}x  "
                  f"({f:.3f} -> {p:.3f} ms)")


if __name__ == "__main__":
    main()
