"""Honest per-component budget of the streaming step (3B, B=1).

Every iteration feeds DISTINCT inputs (the runtime dedupes identical repeat
dispatches — CLAUDE.md), so these are true device+dispatch costs.  Use the
same-run ratios; absolutes are tunnel weather.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS, WARM = 30, 4


def timeit_pool(fn, pools):
    """fn(*pools[i]) with a distinct argument tuple per iteration."""
    for i in range(WARM):
        out = fn(*pools[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(WARM, WARM + ITERS):
        out = fn(*pools[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer, encode_vision
    from deer_vla_tpu.models.vit import vit_forward_stacked
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
    carry = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                       jnp.float32)

    res = {}

    # dual-camera ViT tower only (stacked path, as the step runs it)
    @jax.jit
    def vit_only(p, stk, a, b):
        x = jnp.concatenate([a.reshape(-1, 3, hw, hw),
                             b.reshape(-1, 3, hw, hw)], 0)
        return vit_forward_stacked(p["vit"], stk["vit"],
                                   x.astype(cfg.dtypes.cdt), cfg.vit)[1]

    res["vit_dual_B2"] = timeit_pool(
        vit_only, [(pol.params, pol.stacked, imgs[i], imgs[i])
                   for i in range(n)])

    # full vision encode (ViT + perceiver + fusion)
    enc = jax.jit(lambda p, stk, a, b: encode_vision(p, a, b, cfg,
                                                     stacked=stk))
    res["encode_vision"] = timeit_pool(
        enc, [(pol.params, pol.stacked, imgs[i], imgs[i]) for i in range(n)])

    # speculative head eval on distinct features
    head = pol.params["lm_head"] if cfg.share_exit else pol.params["extra_exit"]

    @jax.jit
    def head_only(h, x, c):
        out, cand = head_step(h, x.astype(jnp.float32), c, cfg.head, None)
        return out.actions[:, 0], cand

    res["head_step"] = timeit_pool(
        head_only, [(head, xs[i], carry) for i in range(n)])

    # fused step at both depths, distinct images, chained carry
    exits = pol.exits

    def th(k):
        t = np.full(cfg.n_layers, -1e30, np.float32)
        for e in exits:
            t[e] = -1e8
        t[exits[k]] = 1e30
        return jnp.asarray(t)

    for depth, label in ((0, "first"), (len(exits) - 1, "full")):
        tk = th(depth)
        c = carry
        for i in range(WARM):
            arm, gp, c, el = pol._step(pol.params, pol.stacked, imgs[i],
                                       imgs[i], ids, mask, c, tk)
        jax.block_until_ready((arm, gp, c, el))
        assert int(el[0]) == exits[depth]
        t0 = time.perf_counter()
        for i in range(WARM, WARM + ITERS):
            arm, gp, c, el = pol._step(pol.params, pol.stacked, imgs[i],
                                       imgs[i], ids, mask, c, tk)
        jax.block_until_ready((arm, gp, c, el))
        res[f"fused_{label}"] = (time.perf_counter() - t0) / ITERS * 1000

    res["derived_first_minus_encode_2head"] = (
        res["fused_first"] - res["encode_vision"] - 2 * res["head_step"])
    for k, v in res.items():
        print(f"{k:34s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
