"""Dedupe-proof packed-vs-full A/B: DISTINCT input images every iteration.

The axon runtime appears to cache identical repeat dispatches (identical
program + identical argument buffers return without re-execution: a B=32
dual ViT-L encode "measured" 0.088 ms on repeat args).  Here every step gets
a different image and the LSTM carry chains, so every dispatch is unique
work — the honest serving measurement.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.ops.lstm import zero_carry

    model = sys.argv[1] if len(sys.argv) > 1 else "mpt_dolly_3b"
    cfg = MODEL_REGISTRY[model](max_layer=12)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    iters, warmup = 30, 5
    imgs = [jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(iters + warmup)]
    jax.block_until_ready(imgs)
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)

    results = {}
    for name, pack in (("packed", True), ("full", False)):
        pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * 6, pack=pack)
        exits = pol.exits

        def th(k):
            t = np.full(cfg.n_layers, -1e30, np.float32)
            for e in exits:
                t[e] = -1e8
            t[exits[k]] = 1e30
            return jnp.asarray(t)

        for depth, label in ((0, "first"), (len(exits) - 1, "full_depth")):
            tk = th(depth)
            carry = zero_carry(cfg.head.lstm_num_layers, 1,
                               cfg.head.hidden_size, jnp.float32)
            for i in range(warmup):
                arm, gp, carry, el = pol._step(pol.params, pol.stacked,
                                               imgs[i], imgs[i], ids, mask,
                                               carry, tk)
            jax.block_until_ready((arm, gp, carry, el))
            assert int(el[0]) == exits[depth], (int(el[0]), exits[depth])
            t0 = time.perf_counter()
            for i in range(warmup, warmup + iters):
                arm, gp, carry, el = pol._step(pol.params, pol.stacked,
                                               imgs[i], imgs[i], ids, mask,
                                               carry, tk)
            jax.block_until_ready((arm, gp, carry, el))
            ms = (time.perf_counter() - t0) / iters * 1000
            results[f"{name}_{label}"] = ms
            print(f"{name:7s} {label:10s} {ms:8.3f} ms")

    for label in ("first", "full_depth"):
        f, p = results[f"full_{label}"], results[f"packed_{label}"]
        print(f"speedup {label:10s}: {f / p:5.2f}x  ({f:.3f} -> {p:.3f} ms)")


if __name__ == "__main__":
    main()
