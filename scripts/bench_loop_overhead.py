"""Isolate the while-loop policy step's fixed cost, same process.

Programs compared (identical argument trees -> identical marshaling cost):
  A. trivial: same args, returns one scalar                (pure dispatch)
  B. straightline: encode + 2 layers + 2 head evals, no loop
  C. fused first-exit: the real while-loop step, stops after segment 0
  D. fused full-depth
  E. while_loop with a TRIVIAL body over the same arg tree (loop machinery)

C - B = while_loop machinery + exit plumbing at equal compute.
A = marshaling floor.  All device-pipelined, one block at the end.

WARNING: repeat-arg timings here are dedupe-contaminated (the runtime
skips re-executing identical dispatches); use the bench_packed_ab2.py
pattern (distinct inputs per iteration) for honest numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer, encode_vision
    from deer_vla_tpu.models.mpt import embed_tokens, make_attn_bias, \
        mpt_block_forward
    from deer_vla_tpu.models.gated_xattn import gated_xattn_forward
    from deer_vla_tpu.models.action_head import head_step
    from deer_vla_tpu.ops.lstm import zero_carry

    model = sys.argv[1] if len(sys.argv) > 1 else "mpt_dolly_3b"
    cfg = MODEL_REGISTRY[model](max_layer=12)
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

    policy = ScanDeerPolicy(params, cfg, thresholds=[1e8] * 6)
    stacked = policy.stacked
    exits = policy.exits
    carry = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                       jnp.float32)

    def thresholds(k):
        th = np.full(cfg.n_layers, -1e30, np.float32)
        for e in exits:
            th[e] = -1e8
        th[exits[k]] = 1e30
        return jnp.asarray(th)

    args = (params, stacked, img, grip, ids, mask, carry, thresholds(0))

    # A. trivial same-args program
    @jax.jit
    def trivial(params, stacked, img, grip, ids, mask, carry, th):
        return img.sum() + th.sum()

    # B. straightline equal-compute program (no while_loop)
    head = params["lm_head"] if cfg.share_exit else params["extra_exit"]
    mloc_const = ids == cfg.media_token_id

    @jax.jit
    def straight(params, stacked, img, grip, ids, mask, carry, th):
        media = encode_vision(params, img, grip, cfg)
        x = embed_tokens(params["decoder"], ids, cfg.dtypes.cdt)
        bias = make_attn_bias(mask, cfg.mpt, x.dtype)
        mloc = ids == cfg.media_token_id
        xp = x
        for i in range(2):
            xat = jax.tree_util.tree_map(lambda s: s[stacked["xattn_idx"][i]],
                                         stacked["xattn"])
            xp = x
            x = gated_xattn_forward(
                xat, x, media, mloc, heads=cfg.xattn_heads,
                dim_head=cfg.xattn_dim_head,
                only_attend_immediate_media=cfg.only_attend_immediate_media)
            blk = jax.tree_util.tree_map(lambda s: s[i], stacked["blocks"])
            x = mpt_block_forward(blk, x, bias, cfg.mpt)
        h = params["lm_head"] if cfg.share_exit else params["extra_exit"]
        o1, c1 = head_step(h, x.astype(jnp.float32), carry, cfg.head, None)
        o2, c2 = head_step(h, xp.astype(jnp.float32), carry, cfg.head, None)
        return o1.actions[:, 0], o2.actions[:, 0], c1

    # E. while_loop with trivial body, same arg tree
    @jax.jit
    def loop_trivial(params, stacked, img, grip, ids, mask, carry, th):
        def body(state):
            j, acc = state
            return j + 1, acc + th[j]

        def cond(state):
            return state[0] < 6

        return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0)))

    res = {}
    res["A_trivial_same_args"] = timeit(trivial, *args)
    res["B_straightline_seg0"] = timeit(straight, *args)
    res["C_fused_first_exit"] = timeit(policy._step, *args)
    res["D_fused_full_depth"] = timeit(policy._step, *args[:-1],
                                       thresholds(len(exits) - 1))
    res["E_loop_trivial_body"] = timeit(loop_trivial, *args)

    res["C_minus_B(loop machinery)"] = res["C_fused_first_exit"] - \
        res["B_straightline_seg0"]
    res["B_minus_A(device compute)"] = res["B_straightline_seg0"] - \
        res["A_trivial_same_args"]
    for k, v in res.items():
        print(f"{k:28s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
