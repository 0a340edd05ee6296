"""Does splitting the serving batch into independent group programs beat
one big batched program on this runtime?

The backend appears to run INDEPENDENT dispatches in parallel (CLAUDE.md).
If so, K groups of B/K streams — each group carry-chained within itself but
independent of the others — should outperform one carry-chained B-stream
program.  Distinct images every dispatch (dedupe-proof).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS, WARM = 12, 3


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.ops.lstm import zero_carry

    cfg = MODEL_REGISTRY["mpt_dolly_3b"](max_layer=12)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    ids_of = {}

    def inputs(b, i):
        if b not in ids_of:
            idsB = np.full((b, s), 11, np.int32)
            idsB[:, 0] = cfg.media_token_id
            ids_of[b] = (jnp.asarray(idsB), jnp.ones((b, s), jnp.int32))
        img = jnp.asarray(r.randn(b, 1, 1, 3, hw, hw), jnp.float32)
        return (img,) + ids_of[b]

    def run(total_b, k_groups):
        gb = total_b // k_groups
        pol = ScanDeerPolicy(params, cfg,
                             thresholds=[-1e8] * 5 + [1e8])
        exits = pol.exits
        th = np.full(cfg.n_layers, -1e30, np.float32)
        for e in exits:
            th[e] = -1e8
        th[exits[-1]] = 1e30
        th = jnp.asarray(th)
        carries = [zero_carry(cfg.head.lstm_num_layers, gb,
                              cfg.head.hidden_size, jnp.float32)
                   for _ in range(k_groups)]
        pool = [[inputs(gb, i) for _ in range(k_groups)]
                for i in range(ITERS + WARM)]
        outs = [None] * k_groups

        def step_all(i):
            for g in range(k_groups):
                img, idsB, maskB = pool[i][g]
                arm, gp, c, el = pol._step(pol.params, pol.stacked, img, img,
                                           idsB, maskB, carries[g], th)
                carries[g] = c
                outs[g] = (arm, gp, el)

        for i in range(WARM):
            step_all(i)
        jax.block_until_ready((carries, outs))
        t0 = time.perf_counter()
        for i in range(WARM, WARM + ITERS):
            step_all(i)
        jax.block_until_ready((carries, outs))
        dt = time.perf_counter() - t0
        aps = total_b * ITERS / dt
        print(f"B={total_b:3d} groups={k_groups:2d} (gb={gb:3d}): "
              f"{1000 * dt / ITERS:8.2f} ms/round  {aps:7.1f} actions/s")
        return aps

    for total_b, k in ((32, 1), (32, 4), (32, 8), (64, 8), (128, 16)):
        run(total_b, k)


if __name__ == "__main__":
    main()
