"""SERIAL per-component budget: every iteration's input depends on the
previous iteration's output, so the runtime cannot overlap iterations.

Two discoveries shape this harness (CLAUDE.md):
  * identical repeat dispatches are deduped -> distinct inputs per iter;
  * INDEPENDENT dispatches run in parallel across the backend pool ->
    chain a data dependency to measure true serial latency.
The dependency is `input_i + 1e-38 * prev_scalar`: numerically invisible,
but un-foldable, so the add (and everything before it) must wait.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS, WARM = 30, 4


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import encode_vision, init_deer
    from deer_vla_tpu.models.gated_xattn import gated_xattn_forward
    from deer_vla_tpu.models.mpt import make_attn_bias, mpt_block_forward
    from deer_vla_tpu.models.action_head import head_step
    from deer_vla_tpu.ops.lstm import zero_carry

    model = sys.argv[1] if len(sys.argv) > 1 else "mpt_dolly_3b"
    cfg = MODEL_REGISTRY[model](max_layer=12)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * 6)

    hw, s, d = cfg.vit.image_size, cfg.text_len, cfg.mpt.d_model
    r = np.random.RandomState(0)
    n = ITERS + WARM
    imgs = [jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(n)]
    xs = [jnp.asarray(r.randn(1, s, d), cfg.dtypes.cdt) for _ in range(n)]
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)
    carry0 = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                        jnp.float32)

    def timeit_serial(fn, pools):
        """fn(pool_args, prev_scalar) -> (out..., scalar); scalar chains."""
        prev = jnp.float32(0.0)
        for i in range(WARM):
            out = fn(pools[i], prev)
            prev = out[-1]
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(WARM, WARM + ITERS):
            out = fn(pools[i], prev)
            prev = out[-1]
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / ITERS * 1000

    res = {}

    @jax.jit
    def enc_chained(p, stk, img, prev):
        m = encode_vision(p, img + 1e-38 * prev, img, cfg, stacked=stk)
        return m, m.mean().astype(jnp.float32)

    res["encode_serial"] = timeit_serial(
        lambda a, prev: enc_chained(pol.params, pol.stacked, a, prev), imgs)

    head = pol.params["lm_head"] if cfg.share_exit else pol.params["extra_exit"]

    @jax.jit
    def head_chained(h, x, prev):
        out, cand = head_step(h, (x + 1e-38 * prev).astype(jnp.float32),
                              carry0, cfg.head, None)
        a = out.actions[:, 0]
        return a, a.mean().astype(jnp.float32)

    res["head_serial"] = timeit_serial(
        lambda x, prev: head_chained(head, x, prev), xs)

    media0 = enc_chained(pol.params, pol.stacked, imgs[0],
                         jnp.float32(0.0))[0]
    bias = make_attn_bias(mask, cfg.mpt, xs[0].dtype)
    mloc = ids == cfg.media_token_id

    @jax.jit
    def seg_chained(p, stk, x, prev):
        x = x + 1e-38 * prev
        for i in range(2):  # one exit segment = stride 2 layers
            xat = jax.tree_util.tree_map(lambda t: t[stk["xattn_idx"][i]],
                                         stk["xattn"])
            x = gated_xattn_forward(
                xat, x, media0, mloc, heads=cfg.xattn_heads,
                dim_head=cfg.xattn_dim_head,
                only_attend_immediate_media=cfg.only_attend_immediate_media)
            blk = jax.tree_util.tree_map(lambda t: t[i], stk["blocks"])
            x = mpt_block_forward(blk, x, bias, cfg.mpt)
        return x, x.mean().astype(jnp.float32)

    res["segment2_serial"] = timeit_serial(
        lambda x, prev: seg_chained(pol.params, pol.stacked, x, prev), xs)

    # reference points: the fused step (carry-chained, distinct images)
    exits = pol.exits

    def th(k):
        t = np.full(cfg.n_layers, -1e30, np.float32)
        for e in exits:
            t[e] = -1e8
        t[exits[k]] = 1e30
        return jnp.asarray(t)

    for depth, label in ((0, "first"), (len(exits) - 1, "full")):
        tk = th(depth)
        c = carry0
        for i in range(WARM):
            arm, gp, c, el = pol._step(pol.params, pol.stacked, imgs[i],
                                       imgs[i], ids, mask, c, tk)
        jax.block_until_ready((arm, gp, c, el))
        t0 = time.perf_counter()
        for i in range(WARM, WARM + ITERS):
            arm, gp, c, el = pol._step(pol.params, pol.stacked, imgs[i],
                                       imgs[i], ids, mask, c, tk)
        jax.block_until_ready((arm, gp, c, el))
        res[f"fused_{label}"] = (time.perf_counter() - t0) / ITERS * 1000

    res["sum_first(enc+seg+2head)"] = (res["encode_serial"]
                                       + res["segment2_serial"]
                                       + 2 * res["head_serial"])
    for k, v in res.items():
        print(f"{k:28s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
