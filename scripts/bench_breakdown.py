"""Same-process component breakdown of the while-loop policy step (TPU).

Times each stage of the streaming action path as its own jitted program,
device-pipelined where a carry allows it, and compares against the fused
while-loop step — isolating vision encode / perceiver / decoder layers /
head / loop+dispatch overhead.  Absolute numbers are tunnel weather; only
the SAME-RUN ratios are meaningful (CLAUDE.md).

Usage:  python scripts/bench_breakdown.py [model]

WARNING: numbers from repeat-arg timing are contaminated by the runtime's
identical-dispatch deduplication (see CLAUDE.md) — vary inputs per iteration
for honest measurements (bench_packed_ab2.py pattern).
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
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy, \
        stack_decoder_layers
    from deer_vla_tpu.models.flamingo import init_deer, encode_vision
    from deer_vla_tpu.models.mpt import embed_tokens, make_attn_bias, \
        mpt_block_forward
    from deer_vla_tpu.models.gated_xattn import gated_xattn_forward
    from deer_vla_tpu.models.action_head import head_step
    from deer_vla_tpu.models.vit import vit_forward
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

    res = {}

    # 1. dual-camera ViT only (both cameras in one B=2 pass, as encode does)
    @jax.jit
    def vit_only(p, a, b):
        x = jnp.concatenate([a.reshape(-1, 3, hw, hw),
                             b.reshape(-1, 3, hw, hw)], 0)
        _, toks = vit_forward(p["vit"], x.astype(cfg.dtypes.cdt), cfg.vit)
        return toks

    res["vit_dual"] = timeit(vit_only, params, img, grip)

    # 2. full vision encode (ViT + perceiver + fusion)
    enc = jax.jit(lambda p, a, b: encode_vision(p, a, b, cfg))
    res["encode_vision"] = timeit(enc, params, img, grip)

    # 3. embed + bias
    @jax.jit
    def embed(p, ids, mask):
        x = embed_tokens(p["decoder"], ids, cfg.dtypes.cdt)
        return x, make_attn_bias(mask, cfg.mpt, x.dtype)

    res["embed_bias"] = timeit(embed, params, ids, mask)

    media = enc(params, img, grip)
    x0, bias = embed(params, ids, mask)
    mloc = ids == cfg.media_token_id

    # 4. one decoder layer (x-attn + block), layer 0 weights
    blk0 = jax.tree_util.tree_map(lambda l: l, params["decoder"]["blocks"][0])
    xat0 = params["decoder"]["xattn"][0]

    @jax.jit
    def one_layer(blk, xat, x, media, bias):
        x = gated_xattn_forward(
            xat, x, media, mloc, heads=cfg.xattn_heads,
            dim_head=cfg.xattn_dim_head,
            only_attend_immediate_media=cfg.only_attend_immediate_media)
        return mpt_block_forward(blk, x, bias, cfg.mpt)

    res["one_layer_xattn_block"] = timeit(one_layer, blk0, xat0, x0, media,
                                          bias)

    # 5. head_step alone (speculative head eval)
    head = params["lm_head"] if cfg.share_exit else params["extra_exit"]
    carry = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                       jnp.float32)

    @jax.jit
    def head_only(head, x, carry):
        out, cand = head_step(head, x.astype(jnp.float32), carry, cfg.head,
                              None)
        return out.actions[:, 0], out.gripper_probs[:, 0], cand

    res["head_step"] = timeit(head_only, head, x0, carry)

    # 6. N stacked layers via fori (no exits, no while_loop) — isolates the
    #    decoder stack cost the way the while-loop body pays it
    stacked = stack_decoder_layers(params, cfg)

    def make_fori(n):
        @jax.jit
        def fori(stacked, x, media, bias):
            def body(i, x):
                xat = jax.tree_util.tree_map(
                    lambda s: s[stacked["xattn_idx"][i]], stacked["xattn"])
                x = gated_xattn_forward(
                    xat, x, media, mloc, heads=cfg.xattn_heads,
                    dim_head=cfg.xattn_dim_head,
                    only_attend_immediate_media=cfg.only_attend_immediate_media)
                blk = jax.tree_util.tree_map(lambda s: s[i],
                                             stacked["blocks"])
                return mpt_block_forward(blk, x, bias, cfg.mpt)
            return jax.lax.fori_loop(0, n, body, x)
        return fori

    fori12 = make_fori(cfg.n_layers)
    res["fori_12_layers"] = timeit(fori12, stacked, x0, media, bias)

    # 7. fused while-loop step at full depth (the bench path)
    policy = ScanDeerPolicy(params, cfg, thresholds=[1e8] * 6)
    exits = policy.exits
    th = np.full(cfg.n_layers, -1e30, np.float32)
    for e in exits:
        th[e] = -1e8
    th[exits[-1]] = 1e30
    th_full = jnp.asarray(th)
    th_first = np.full(cfg.n_layers, -1e30, np.float32)
    th_first[exits[0]] = 1e30
    th_first = jnp.asarray(th_first)

    def fused(th):
        c = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                       jnp.float32)
        arm, gp, c, el = policy._step(params, policy.stacked, img, grip, ids,
                                      mask, c, th)
        return arm, gp, c, el

    res["fused_full_depth"] = timeit(fused, th_full)
    res["fused_first_exit"] = timeit(fused, th_first)

    # derived
    res["derived_fixed_cost"] = res["fused_first_exit"] - (
        2 * res["one_layer_xattn_block"] + 2 * res["head_step"])
    res["derived_loop_overhead_vs_parts"] = res["fused_full_depth"] - (
        res["encode_vision"] + res["embed_bias"] + res["fori_12_layers"]
        + 7 * res["head_step"])

    for k, v in res.items():
        print(f"{k:32s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
