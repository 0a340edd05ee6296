"""ToMe token merging (ops/tome.py, models/vit.vit_forward_tome).

Covers: schedule arithmetic, merge-math equivalence vs an independent numpy
replica of the bipartite soft-matching rules (ToMe, arXiv:2210.09461 §3),
size conservation, CLS protection, r=0 exactness vs the exact tower, the
stacked-tree serving route, FLOPs accounting, and end-to-end serving through
ScanDeerPolicy at tiny scale.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import MODEL_REGISTRY, ViTConfig
from deer_vla_tpu.ops.tome import (bipartite_merge, proportional_attn_bias,
                                   tome_schedule)


def test_schedule_constant_r_and_clipping():
    # ViT-L/14 @224: 256 patches, 24 layers, r=8 -> 8 every layer, 64 left
    s = tome_schedule(256, 24, 8)
    assert s == [8] * 24
    assert 256 - sum(s) == 64
    # tiny: 4 patches, 2 layers, r=1 -> [1, 1]; r=3 clips to n//2 then min_keep
    assert tome_schedule(4, 2, 1) == [1, 1]
    assert tome_schedule(4, 2, 3, min_keep=2) == [2, 0]
    assert tome_schedule(4, 2, 0) == [0, 0]
    # never below min_keep
    for r in (1, 2, 5, 50):
        n = 16
        for ri in tome_schedule(n, 10, r, min_keep=3):
            n -= ri
        assert n >= 3


def _np_reference_merge(tokens, metric, sizes, r):
    """Independent numpy replica of ToMe bipartite soft matching: A = even
    indices, B = odd; top-r A rows by best cosine match merge into their B
    argmax via size-weighted mean; output = [unmerged A, B]."""
    b, n, d = tokens.shape
    m = metric / np.maximum(np.linalg.norm(metric, axis=-1, keepdims=True), 1e-6)
    ma, mb = m[:, ::2], m[:, 1::2]
    out_t, out_s = [], []
    for bi in range(b):
        scores = ma[bi] @ mb[bi].T
        node_max, node_idx = scores.max(-1), scores.argmax(-1)
        order = np.argsort(-node_max, kind="stable")
        src, unm = order[:r], order[r:]
        ta, tb = tokens[bi, ::2].copy(), tokens[bi, 1::2].copy()
        sa, sb = sizes[bi, ::2].copy(), sizes[bi, 1::2].copy()
        num = tb * sb[:, None]
        new_sb = sb.copy()
        for si in src:
            di = node_idx[si]
            num[di] += ta[si] * sa[si]
            new_sb[di] += sa[si]
        merged = num / new_sb[:, None]
        out_t.append(np.concatenate([ta[unm], merged], 0))
        out_s.append(np.concatenate([sa[unm], new_sb], 0))
    return np.stack(out_t), np.stack(out_s)


def test_bipartite_merge_matches_numpy_reference():
    rng = np.random.RandomState(0)
    b, n, d, r = 3, 12, 8, 3
    tokens = rng.randn(b, n, d).astype(np.float32)
    metric = rng.randn(b, n, 5).astype(np.float32)
    sizes = rng.randint(1, 4, (b, n)).astype(np.float32)
    jt, js = bipartite_merge(jnp.asarray(tokens), jnp.asarray(metric),
                             jnp.asarray(sizes), r)
    nt, ns = _np_reference_merge(tokens, metric, sizes, r)
    assert jt.shape == (b, n - r, d) and js.shape == (b, n - r)
    # the merged-B half is order-stable; the unmerged-A half depends on the
    # argsort order, which both implementations share (ties broken by index)
    np.testing.assert_allclose(np.asarray(jt), nt, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(js), ns, rtol=1e-6, atol=1e-6)


def test_merge_conserves_total_size_and_token_mass():
    rng = np.random.RandomState(1)
    b, n, d, r = 2, 10, 4, 2
    tokens = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    sizes = jnp.ones((b, n), jnp.float32)
    metric = jnp.asarray(rng.randn(b, n, 6).astype(np.float32))
    out_t, out_s = bipartite_merge(tokens, metric, sizes, r)
    # every input patch is represented exactly once
    np.testing.assert_allclose(np.asarray(out_s.sum(1)), np.full(b, n), rtol=1e-6)
    # size-weighted token mass is conserved (merge = weighted mean)
    mass_in = np.asarray((tokens * sizes[..., None]).sum(1))
    mass_out = np.asarray((out_t * out_s[..., None]).sum(1))
    np.testing.assert_allclose(mass_out, mass_in, rtol=1e-4, atol=1e-4)


def test_merge_r0_and_invalid_r():
    t = jnp.ones((1, 4, 2))
    s = jnp.ones((1, 4))
    m = jnp.ones((1, 4, 2))
    ot, os_ = bipartite_merge(t, m, s, 0)
    assert ot is t and os_ is s
    with pytest.raises(ValueError):
        bipartite_merge(t, m, s, 3)  # max for n=4 is 2


def test_proportional_bias_shape_and_values():
    sizes = jnp.asarray([[1.0, 2.0, 4.0]])
    b = proportional_attn_bias(sizes, sq=5)
    assert b.shape == (1, 1, 5, 3)
    np.testing.assert_allclose(np.asarray(b[0, 0, 0]),
                               np.log([1.0, 2.0, 4.0]), rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_vit():
    # 4x4 grid so merging has room: 16 patches + CLS
    cfg = ViTConfig(image_size=56, patch_size=14, width=32, layers=3, heads=4)
    from deer_vla_tpu.models.vit import init_vit
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 56, 56), jnp.float32)
    return cfg, params, x


def test_tome_r0_exact_vs_vit_forward(tiny_vit):
    from deer_vla_tpu.models.vit import vit_forward, vit_forward_tome
    cfg, params, x = tiny_vit
    p0, t0 = vit_forward(params, x, cfg)
    p1, t1 = vit_forward_tome(params, x, dataclasses.replace(cfg, tome_r=0))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_tome_shrinks_tokens_and_keeps_cls(tiny_vit):
    from deer_vla_tpu.models.vit import vit_forward_tome
    cfg, params, x = tiny_vit
    cfg_t = dataclasses.replace(cfg, tome_r=2)
    pooled, tokens = jax.jit(
        lambda p, v: vit_forward_tome(p, v, cfg_t))(params, x)
    assert tokens.shape == (2, 16 - 3 * 2, cfg.width)
    assert pooled.shape == (2, cfg.width)
    assert np.isfinite(np.asarray(tokens)).all()
    # CLS is protected: pooled differs from every surviving patch token
    # (it was never averaged into the patch set)
    assert not np.allclose(np.asarray(pooled)[:, None, :], np.asarray(tokens),
                           atol=1e-3)


def test_tome_stacked_route_matches_list_route(tiny_vit):
    from deer_vla_tpu.models.vit import stack_vit_blocks, vit_forward_tome
    cfg, params, x = tiny_vit
    cfg_t = dataclasses.replace(cfg, tome_r=2)
    stacked = stack_vit_blocks(params)
    p0, t0 = vit_forward_tome(params, x, cfg_t)
    p1, t1 = vit_forward_tome(params, x, cfg_t, stacked)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=1e-6, atol=1e-6)


def test_flops_accounting_decreases_and_tracks_tokens():
    from deer_vla_tpu.eval.flops import final_vit_tokens, vit_flops
    exact = ViTConfig()
    tome = ViTConfig(tome_r=8)
    assert final_vit_tokens(exact) == 256
    assert final_vit_tokens(tome) == 64
    f_exact, f_tome = vit_flops(exact), vit_flops(tome)
    # r=8 on ViT-L should cut a large share of tower FLOPs
    assert f_tome < 0.75 * f_exact
    # r=0 path is the pre-ToMe closed form
    s, d, inner = exact.seq_len, exact.width, int(exact.width * exact.mlp_ratio)
    from deer_vla_tpu.eval.flops import attention_flops, linear_flops
    per_layer = (attention_flops(s, s, d, d) + linear_flops(s, d, inner)
                 + linear_flops(s, inner, d))
    patch = linear_flops(exact.num_patches, 3 * exact.patch_size ** 2, d)
    assert f_exact == patch + exact.layers * per_layer


def test_full_step_flops_drop_under_tome():
    from deer_vla_tpu.eval.flops import full_step_flops
    cfg = MODEL_REGISTRY["mpt_dolly_3b"](max_layer=12)
    cfg_t = dataclasses.replace(cfg, vit=dataclasses.replace(cfg.vit, tome_r=8))
    g0 = full_step_flops(cfg, 1)
    g1 = full_step_flops(cfg_t, 1)
    assert g1 < 0.75 * g0, (g0, g1)


def test_scan_policy_serves_with_tome():
    """End-to-end: the while-loop engine serves a ToMe'd tiny model; the
    merged tower changes only the media token count feeding the perceiver."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer

    cfg = MODEL_REGISTRY["tiny"]()
    # tiny default grid is 2x2=4 patches; use a 4x4 grid so r=1 has room
    cfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, image_size=56, tome_r=1))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    n_exits = cfg.num_exits
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * n_exits)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.zeros((1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    a = pol.step(img, img, jnp.asarray(ids), jnp.ones((1, s), jnp.int32))
    assert np.isfinite(np.asarray(a)).all()
    assert pol.last_exit_layer in cfg.all_exit_ids()


def test_tome_composes_with_int8_quantized_stack():
    """The quantized serving tree slices per layer the same way the bf16
    tree does (ops/quant.py docstring contract), so --quantize int8 and
    --vit_tome_r compose in one engine."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer

    cfg = MODEL_REGISTRY["tiny"]()
    cfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, image_size=56, tome_r=1))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * cfg.num_exits,
                         quantize="int8")
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.zeros((1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    a = pol.step(img, img, jnp.asarray(ids), jnp.ones((1, s), jnp.int32))
    assert np.isfinite(np.asarray(a)).all()


def test_tome_engine_equivalence_scan_vs_bucketed():
    """Both serving engines route vision through vision_tokens, so under
    --vit_tome_r they must still agree on actions AND exit choices — the
    cross-engine contract the serving matrix pins for the exact tower."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import ExitController

    cfg = MODEL_REGISTRY["tiny"]()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(
        cfg, media_token_id=tok.media_token_id,
        vit=dataclasses.replace(cfg.vit, image_size=56, tome_r=1))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    exits = list(cfg.all_exit_ids())
    th = [0.05, 1e8]
    ctrl = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: t for e, t in zip(exits, th)})
    host = DeerPolicy(params, cfg, controller=ctrl)
    scan = ScanDeerPolicy(params, cfg, thresholds=list(th))
    r = np.random.RandomState(0)
    hw, s = cfg.vit.image_size, cfg.text_len
    ids = np.full((1, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)
    for t in range(3):
        img = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
        grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
        host.set_timestep(t)
        a_h = host.step(img, grip, ids, mask)
        a_s = scan.step(img, grip, ids, mask)
        assert scan.last_exit_layer == host.last_exit_layer
        np.testing.assert_allclose(a_s, a_h, rtol=2e-4, atol=2e-4)
