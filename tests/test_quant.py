"""Weight-only int8 serving quantization (ops/quant.py): scheme error
bounds, the linear/indexed-matmul consumers, and the while-loop engine's
--quantize int8 path end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.ops.layers import linear
from deer_vla_tpu.ops.quant import (dequantize_weight, quantize_tree,
                                    quantize_weight, tree_bytes)


def test_quantize_roundtrip_error_bound():
    """|w - q*s| <= s/2 elementwise (round-to-nearest, symmetric)."""
    r = np.random.RandomState(0)
    for shape in [(64, 96), (3, 64, 96)]:
        w = jnp.asarray(r.randn(*shape).astype(np.float32))
        q, s = quantize_weight(w)
        assert q.dtype == jnp.int8 and s.dtype == jnp.float32
        assert q.shape == w.shape and s.shape == shape[:-2] + shape[-1:]
        deq = dequantize_weight(q, s)
        err = np.abs(np.asarray(w) - np.asarray(deq))
        bound = np.asarray(s)[..., None, :] / 2 + 1e-7
        assert (err <= np.broadcast_to(bound, err.shape)).all()
        # the max |w| per column is exactly representable
        assert np.abs(np.asarray(q)).max() == 127


def test_linear_quantized_close():
    r = np.random.RandomState(1)
    p = {"w": jnp.asarray(r.randn(128, 64).astype(np.float32)) * 0.05,
         "b": jnp.asarray(r.randn(64).astype(np.float32))}
    x = jnp.asarray(r.randn(4, 128).astype(np.float32))
    y = linear(p, x)
    q, s = quantize_weight(p["w"])
    yq = linear({"q": q, "s": s, "b": p["b"]}, x)
    # per-channel int8 on a 128-dim contraction: sub-percent relative error
    np.testing.assert_allclose(np.asarray(yq), np.asarray(y),
                               rtol=0, atol=0.02)


def test_indexed_matmul_q8_fallback_matches_dequant():
    from deer_vla_tpu.ops.pallas.indexed_matmul import indexed_matmul_q8
    r = np.random.RandomState(2)
    w = jnp.asarray(r.randn(3, 128, 256).astype(np.float32))
    x = jnp.asarray(r.randn(8, 128).astype(np.float32))
    q, s = quantize_weight(w)
    for i in range(3):
        got = indexed_matmul_q8(x, q, s, i, backend="xla")
        want = jnp.dot(x, dequantize_weight(q[i], s[i]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_linear_w8a8_close():
    """int8 x int8 -> int32 path (s8 layout): per-row activation scales +
    per-channel weight scales recover the fp product within the combined
    quantization error."""
    r = np.random.RandomState(4)
    w = jnp.asarray(r.randn(256, 128).astype(np.float32)) * 0.05
    b = jnp.asarray(r.randn(128).astype(np.float32)) * 0.1
    x = jnp.asarray(r.randn(6, 256).astype(np.float32))
    y = linear({"w": w, "b": b}, x)
    q, s = quantize_weight(w)
    yq = linear({"q": q, "s8": s, "b": b}, x)
    rel = np.abs(np.asarray(y - yq)).max() / np.abs(np.asarray(y)).max()
    assert rel < 0.03, rel
    # 3-D activations (B, S, K) go through the same dot_general
    x3 = jnp.asarray(r.randn(2, 5, 256).astype(np.float32))
    y3 = linear({"w": w, "b": b}, x3)
    yq3 = linear({"q": q, "s8": s, "b": b}, x3)
    assert yq3.shape == y3.shape
    assert np.abs(np.asarray(y3 - yq3)).max() / \
        np.abs(np.asarray(y3)).max() < 0.03


def test_scan_policy_w8a8_serves(tiny_setup):
    """--quantize int8_w8a8: the while-loop engine serves with int8 MXU
    matmuls; exits match fp at forced depth and actions stay correlated
    (activation quantization adds noise on a tiny random model)."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = tiny_setup
    fp = ScanDeerPolicy(params, cfg)
    qq = ScanDeerPolicy(params, cfg, quantize="int8_w8a8")
    th = [-1e8] * (len(fp.exits) - 1) + [1e8]
    fp.set_thresholds(list(th)), qq.set_thresholds(list(th))
    for i in range(2):
        img, grip, ids, mask = _inputs(cfg, seed=20 + i)
        a = fp.step(img, grip, ids, mask)
        b = qq.step(img, grip, ids, mask)
        assert fp.last_exit_layer == qq.last_exit_layer
        assert np.isfinite(b).all()
        assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.85, (a, b)
    # batched dispatch (the w8a8 target workload) runs too
    r = np.random.RandomState(9)
    hw, s = cfg.vit.image_size, cfg.text_len
    imgB = jnp.asarray(r.randn(2, 1, 1, 3, hw, hw), jnp.float32)
    idsB = np.full((2, s), 7, np.int32)
    idsB[:, 0] = cfg.media_token_id
    acts, els = qq.step_batch(imgB, imgB, jnp.asarray(idsB),
                              jnp.ones((2, s), jnp.int32))
    assert np.isfinite(acts).all() and els.shape == (2,)


def test_quantize_tree_targets_only_w():
    tree = {"wqkv": {"w": jnp.ones((2, 16, 16))},
            "ln": {"scale": jnp.ones((16,)), "bias": jnp.zeros((16,))},
            "gate": jnp.zeros((1,)),
            "nested": [{"w": jnp.ones((8, 8)), "b": jnp.zeros((8,))}]}
    out = quantize_tree(tree)
    assert set(out["wqkv"]) == {"q", "s"}
    assert out["ln"]["scale"].dtype != jnp.int8
    assert set(out["nested"][0]) == {"q", "s", "b"}
    assert tree_bytes(out) < tree_bytes(tree)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, seed=0):
    r = np.random.RandomState(seed)
    hw, sl = cfg.vit.image_size, cfg.text_len
    img = r.randn(1, 1, 1, 3, hw, hw).astype(np.float32)
    grip = r.randn(1, 1, 1, 3, hw, hw).astype(np.float32)
    ids = np.full((1, sl), 7, np.int32)
    ids[0, 0] = cfg.media_token_id
    return img, grip, ids, np.ones((1, sl), np.int32)


def test_scan_policy_int8_close_and_smaller(tiny_setup):
    """--quantize int8 engine: actions stay close to the fp engine at a
    forced depth, the carry threads, and the packed tree actually shrank."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = tiny_setup
    fp = ScanDeerPolicy(params, cfg)
    q8 = ScanDeerPolicy(params, cfg, quantize="int8")
    assert tree_bytes(q8.stacked) < 0.62 * tree_bytes(fp.stacked)
    # full depth forced on both (threshold-crossing order could differ)
    th = [-1e8] * (len(fp.exits) - 1) + [1e8]
    fp.set_thresholds(list(th)), q8.set_thresholds(list(th))
    for i in range(3):
        img, grip, ids, mask = _inputs(cfg, seed=i)
        a = fp.step(img, grip, ids, mask)
        b = q8.step(img, grip, ids, mask)
        assert fp.last_exit_layer == q8.last_exit_layer
        assert np.isfinite(b).all()
        # tanh-bounded actions; tiny random model + int8 everywhere ->
        # loose-but-meaningful closeness (catches wrong scales/transposes,
        # which produce O(1) garbage)
        assert np.abs(a - b).max() < 0.25, (a, b)
        assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.9


def test_scan_policy_int8_dynamic_exit_runs(tiny_setup):
    """Dynamic thresholds: int8 engine exits at a valid layer and streams."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = tiny_setup
    q8 = ScanDeerPolicy(params, cfg, quantize="int8",
                        thresholds=[1e8, 1e8])
    for i in range(2):
        img, grip, ids, mask = _inputs(cfg, seed=10 + i)
        act = q8.step(img, grip, ids, mask)
        assert act.shape == (7,)
        assert q8.last_exit_layer in q8.exits


def test_deer_policy_int8_close(tiny_setup):
    """--quantize int8 on the host-bucketed engine: actions stay close to
    the fp bucketed engine at a forced full depth, and the decoder block
    weights actually went int8 while heads/embeddings stayed fp."""
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.models.value_net import ExitController
    cfg, params = tiny_setup
    exits = list(cfg.all_exit_ids())

    def ctrl():
        c = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
        c.set_thresholds({e: t for e, t in
                          zip(exits, [-1.0] * (len(exits) - 1) + [1e8])})
        return c

    fp = DeerPolicy(params, cfg, controller=ctrl())
    q8 = DeerPolicy(params, cfg, controller=ctrl(), quantize="int8")
    qb = q8.params["decoder"]["blocks"][0]["wqkv"]
    assert set(qb) >= {"q", "s"} and qb["q"].dtype == jnp.int8
    # nothing outside decoder blocks/xattn went int8 (heads, wte, encoders)
    non_dec = {k: v for k, v in q8.params.items() if k != "decoder"}
    assert not any(getattr(x, "dtype", None) == jnp.int8
                   for x in jax.tree_util.tree_leaves(non_dec))
    assert getattr(q8.params["decoder"]["wte"]["w"], "dtype") != jnp.int8
    assert tree_bytes(q8.params["decoder"]["blocks"]) < \
        0.62 * tree_bytes(fp.params["decoder"]["blocks"])
    for t in range(3):
        img, grip, ids, mask = _inputs(cfg, seed=t)
        fp.set_timestep(t), q8.set_timestep(t)
        a = fp.step(img, grip, ids, mask)
        b = q8.step(img, grip, ids, mask)
        assert fp.last_exit_layer == q8.last_exit_layer
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 0.25, (a, b)


def test_deer_policy_int8_gpt_head(tiny_setup):
    """Alt heads route through the bucketed engine; int8 decoder weights
    must compose with a GPT head (head stays fp)."""
    import dataclasses
    from deer_vla_tpu.eval.policy import DeerPolicy
    cfg, _ = tiny_setup
    cfg = dataclasses.replace(cfg, head_type="gpt")
    params = init_deer(jax.random.PRNGKey(1), cfg)
    q8 = DeerPolicy(params, cfg, exit_id=cfg.n_layers - 1, quantize="int8")
    img, grip, ids, mask = _inputs(cfg, seed=0)
    act = q8.step(img, grip, ids, mask)
    assert act.shape == (7,) and np.isfinite(act).all()


def test_bench_int8_view_pattern(tiny_setup):
    """bench.py's int8 block quantizes the LIVE policy's packed tree and
    reuses its jitted step via a lightweight namespace (no second
    stacking) — prove that exact pattern steps and stays close to fp."""
    from types import SimpleNamespace

    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.ops.lstm import zero_carry
    from deer_vla_tpu.ops.quant import quantize_serving_stacked
    cfg, params = tiny_setup
    fp = ScanDeerPolicy(params, cfg)
    q8 = SimpleNamespace(params=fp.params,
                         stacked=quantize_serving_stacked(fp.stacked,
                                                          "int8"),
                         _step=fp._step)
    th = np.full(cfg.n_layers, -1e30, np.float32)
    for e in fp.exits:
        th[e] = -1e8
    th[fp.exits[-1]] = 1e30  # force full depth
    th = jnp.asarray(th)
    img, grip, ids, mask = _inputs(cfg, seed=5)
    carry = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                       jnp.float32)
    arm_f, gp_f, _, el_f = fp._step(fp.params, fp.stacked, img, grip,
                                    ids, mask, carry, th)
    arm_q, gp_q, _, el_q = q8._step(q8.params, q8.stacked, img, grip,
                                    ids, mask, carry, th)
    assert int(el_f[0]) == int(el_q[0]) == fp.exits[-1]
    assert np.isfinite(np.asarray(arm_q)).all()
    assert np.abs(np.asarray(arm_f) - np.asarray(arm_q)).max() < 0.25


def test_quantized_stacked_block_forward_close(tiny_setup):
    """mpt_block_forward_stacked over an int8 stack (the imm path's XLA
    fallback + the sliced linear path) vs the fp stacked forward."""
    from deer_vla_tpu.eval.scan_policy import stack_decoder_layers
    from deer_vla_tpu.models.mpt import make_attn_bias, mpt_block_forward_stacked
    from deer_vla_tpu.ops.quant import quantize_serving_stacked
    cfg, params = tiny_setup
    stacked = stack_decoder_layers(params, cfg)
    q8 = quantize_serving_stacked(stacked, "int8")
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, cfg.text_len, cfg.mpt.d_model)
                    .astype(np.float32)) * 0.1
    mask = jnp.ones((1, cfg.text_len), jnp.int32)
    bias = make_attn_bias(mask, cfg.mpt, jnp.float32)
    for i in [0, cfg.n_layers - 1]:
        y = mpt_block_forward_stacked(stacked["blocks"], i, x, bias, cfg.mpt)
        yq = mpt_block_forward_stacked(q8["blocks"], i, x, bias, cfg.mpt)
        assert np.isfinite(np.asarray(yq)).all()
        rel = (np.abs(np.asarray(y - yq)).max()
               / (np.abs(np.asarray(y)).max() + 1e-9))
        assert rel < 0.05, rel


def test_quantize_serving_stacked_parts():
    """Selective quantization (bench decomposition / deployment split):
    parts='decoder' quantizes blocks+xattn only (vision subtrees pass
    through UNTOUCHED — same leaf objects), parts='vision' the complement,
    and both splits still serve through the while-loop engine with actions
    close to full precision."""
    from types import SimpleNamespace

    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.ops.lstm import zero_carry
    from deer_vla_tpu.ops.quant import quantize_serving_stacked

    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(3), cfg)
    pol = ScanDeerPolicy(params, cfg)
    dec = quantize_serving_stacked(pol.stacked, "int8_w8a8",
                                   parts="decoder")
    vis = quantize_serving_stacked(pol.stacked, "int8_w8a8",
                                   parts="vision")
    # untouched subtrees are the SAME objects (no copy, no quant)
    assert dec["vit"] is pol.stacked["vit"]
    assert vis["blocks"] is pol.stacked["blocks"]
    # touched subtrees carry int8 leaves
    flat_dec = jax.tree_util.tree_leaves(dec["blocks"])
    assert any(x.dtype == jnp.int8 for x in flat_dec)
    flat_vis = jax.tree_util.tree_leaves(vis["vit"])
    assert any(x.dtype == jnp.int8 for x in flat_vis)
    with pytest.raises(ValueError):
        quantize_serving_stacked(pol.stacked, "int8_w8a8", parts="nope")
    with pytest.raises(ValueError):
        quantize_serving_stacked(pol.stacked, "int8_w8a8",
                                 parts=("blocks", "bogus"))

    # both splits serve; actions stay near the fp engine's
    r = np.random.RandomState(0)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.asarray(r.randn(2, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((2, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((2, s), jnp.int32)
    th = jnp.asarray(pol.threshold_row({e: -1e8 for e in pol.exits[:-1]}
                                       | {pol.exits[-1]: 1e30}))
    carry = zero_carry(cfg.head.lstm_num_layers, 2, cfg.head.hidden_size,
                       jnp.float32)
    a_fp, _, _, _ = pol._step(pol.params, pol.stacked, img, img, ids, mask,
                              carry, th)
    for stacked in (dec, vis):
        eng = SimpleNamespace(params=pol.params, stacked=stacked,
                              _step=pol._step)
        a_q, _, _, _ = eng._step(eng.params, eng.stacked, img, img, ids,
                                 mask, carry, th)
        gap = float(np.abs(np.asarray(a_q) - np.asarray(a_fp)).max())
        assert gap < 0.15, gap


def test_int8_exit_agreement_trajectory():
    """VERDICT r2 item 7: trajectory-level exit-CHOICE agreement, fp vs
    int8, under CALIBRATED thresholds — the quantity that moves the
    GFLOPs/success trade-off (action-drift bounds don't capture it).
    Drives bench.run_int8_agreement, the same code the TPU bench records
    in BENCH detail.int8.exit_agreement."""
    import sys
    from pathlib import Path
    from types import SimpleNamespace

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.ops.quant import quantize_serving_stacked

    # fresh params (run_int8_agreement opens the x-attn gates in place);
    # 8 layers -> >2 exits so mid-distribution thresholds exist
    cfg = deer_tiny(n_layers=8)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    policy = ScanDeerPolicy(params, cfg)
    q8 = SimpleNamespace(params=policy.params,
                         stacked=quantize_serving_stacked(policy.stacked,
                                                          "int8"),
                         _step=policy._step)
    out = bench.run_int8_agreement(policy, q8, params, cfg, steps=64,
                                   exit_ratio=0.8, n_streams=8)
    assert "error" not in out, out
    # VERDICT r4 item 2: agreement may only be reported alongside a
    # non-degenerate realized histogram (>= 3 occupied bins here; the
    # degenerate path instead returns {'degenerate': True, ...})
    assert "degenerate" not in out, out
    assert out["steps"] == 64
    assert out["calibration"] == "streamed"
    assert 0.0 <= out["exit_agreement"] <= 1.0
    # int8 is a small perturbation: most exit choices must survive it
    assert out["exit_agreement"] >= 0.5, out
    assert out["mean_abs_exit_gap_layers"] < cfg.n_layers / 2, out
    assert sum(out["fp_exit_hist"]) == 64
    assert out["occupied_bins"] == \
        sum(1 for c in out["fp_exit_hist"] if c > 0)
    assert out["occupied_bins"] >= 3, out


def test_int8_exit_agreement_degenerate_probe_refuses():
    """If the realized fp histogram cannot occupy >= 3 bins even after the
    uniform-target retry, the probe must return an explicit degenerate
    marker WITHOUT an exit_agreement number (a single-bin histogram makes
    agreement=1.0 trivially true — BENCH_r04's failure mode)."""
    import sys
    from pathlib import Path
    from types import SimpleNamespace

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.ops.quant import quantize_serving_stacked

    cfg = deer_tiny(n_layers=8)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    policy = ScanDeerPolicy(params, cfg)
    q8 = SimpleNamespace(params=policy.params,
                         stacked=quantize_serving_stacked(policy.stacked,
                                                          "int8"),
                         _step=policy._step)
    # force degeneracy: every threshold row the probe builds sends all
    # streams to the first exit regardless of deltas
    orig = ScanDeerPolicy.threshold_row

    def all_first(self, th_map):
        return orig(self, {e: 1e30 for e in th_map})

    ScanDeerPolicy.threshold_row = all_first
    try:
        out = bench.run_int8_agreement(policy, q8, params, cfg, steps=32,
                                       exit_ratio=0.8, n_streams=8)
    finally:
        ScanDeerPolicy.threshold_row = orig
    assert out.get("degenerate") is True, out
    assert "exit_agreement" not in out
    assert sum(1 for c in out["fp_exit_hist"] if c > 0) < 3
    # the uniform-target retry was attempted before giving up
    assert out["exit_ratio"] == 1.0


# ---------------------------------------------------------------------------
# int4 weight-only (nibble-packed; ops/quant.quantize_weight4)
# ---------------------------------------------------------------------------


def test_int4_pack_unpack_roundtrip():
    from deer_vla_tpu.ops.quant import unpack_int4
    r = np.random.RandomState(5)
    q = r.randint(-7, 8, (2, 64, 32)).astype(np.int8)
    k = q.shape[-2]
    lo, hi = q[..., : k // 2, :], q[..., k // 2:, :]
    packed = ((hi.astype(np.int16) << 4) | (lo & 0x0F)).astype(np.int8)
    out = np.asarray(unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(out, q)


def test_quantize_weight4_error_bound_and_packing():
    from deer_vla_tpu.ops.quant import dequantize_weight4, quantize_weight4
    r = np.random.RandomState(6)
    for shape in [(64, 96), (3, 64, 96)]:
        w = jnp.asarray(r.randn(*shape).astype(np.float32))
        q4, s = quantize_weight4(w)
        assert q4.dtype == jnp.int8
        assert q4.shape == shape[:-2] + (shape[-2] // 2, shape[-1])
        assert s.shape == shape[:-2] + shape[-1:]
        deq = dequantize_weight4(q4, s)
        err = np.abs(np.asarray(w) - np.asarray(deq))
        bound = np.asarray(s)[..., None, :] / 2 + 1e-7
        assert (err <= np.broadcast_to(bound, err.shape)).all()
        # max |w| per column maps to the +/-7 code
        from deer_vla_tpu.ops.quant import unpack_int4
        assert np.abs(np.asarray(unpack_int4(q4))).max() == 7


def test_linear_int4_matches_dequant_exactly():
    """The q4 linear path must equal x @ dequantize_weight4(...) bit-for-bit
    in fp32 (same unpack, same epilogue scale ordering)."""
    from deer_vla_tpu.ops.quant import dequantize_weight4, quantize_weight4
    r = np.random.RandomState(7)
    w = jnp.asarray(r.randn(128, 64).astype(np.float32)) * 0.05
    b = jnp.asarray(r.randn(64).astype(np.float32))
    x = jnp.asarray(r.randn(4, 128).astype(np.float32))
    q4, s = quantize_weight4(w)
    yq = linear({"q4": q4, "s4": s, "b": b}, x)
    want = jnp.dot(x, jnp.asarray(np.asarray(
        dequantize_weight4(q4, jnp.ones_like(s))))) * s + b
    np.testing.assert_allclose(np.asarray(yq), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # and close to the fp product (coarser than int8 but bounded)
    y = linear({"w": w, "b": b}, x)
    assert np.abs(np.asarray(yq - y)).max() < 0.35


def test_indexed_matmul_q4_fallback_matches_dequant():
    from deer_vla_tpu.ops.pallas.indexed_matmul import indexed_matmul_q4
    from deer_vla_tpu.ops.quant import dequantize_weight4, quantize_weight4
    r = np.random.RandomState(8)
    w = jnp.asarray(r.randn(3, 128, 256).astype(np.float32))
    x = jnp.asarray(r.randn(8, 128).astype(np.float32))
    q4, s = quantize_weight4(w)
    for i in range(3):
        got = indexed_matmul_q4(x, q4, s, i, backend="xla")
        want = jnp.dot(x, dequantize_weight4(q4[i], s[i]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_quantize_tree_int4_mode_and_odd_k_fallback():
    from deer_vla_tpu.ops.quant import quantize_serving_stacked
    tree = {"blocks": {"mlp": {"w": jnp.ones((2, 16, 16))},
                       "odd": {"w": jnp.ones((2, 15, 16))}},
            "has_xattn": jnp.ones((2,), jnp.bool_)}
    out = quantize_serving_stacked(tree, "int4")
    assert set(out["blocks"]["mlp"]) == {"q4", "s4"}
    assert set(out["blocks"]["odd"]) == {"q", "s"}  # odd K -> int8
    assert tree_bytes(out["blocks"]) < tree_bytes(tree["blocks"]) / 3


def test_scan_policy_int4_serves_and_shrinks(tiny_setup):
    """--quantize int4 end-to-end: the while-loop engine serves, exits match
    fp at forced depth, actions stay correlated (int4 is coarse on a random
    tiny model), and the packed tree is ~4x smaller than fp32."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = tiny_setup
    fp = ScanDeerPolicy(params, cfg)
    q4 = ScanDeerPolicy(params, cfg, quantize="int4")
    th = [-1e8] * (len(fp.exits) - 1) + [1e8]
    fp.set_thresholds(list(th)), q4.set_thresholds(list(th))
    for i in range(2):
        img, grip, ids, mask = _inputs(cfg, seed=40 + i)
        a = fp.step(img, grip, ids, mask)
        b = q4.step(img, grip, ids, mask)
        assert fp.last_exit_layer == q4.last_exit_layer
        assert np.isfinite(b).all()
        assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.8, (a, b)
    big_fp = sum(x.size * x.dtype.itemsize
                 for k in ("blocks", "xattn", "vit", "perceiver")
                 if k in fp.stacked
                 for x in jax.tree_util.tree_leaves(fp.stacked[k]))
    big_q4 = sum(x.size * x.dtype.itemsize
                 for k in ("blocks", "xattn", "vit", "perceiver")
                 if k in q4.stacked
                 for x in jax.tree_util.tree_leaves(q4.stacked[k]))
    assert big_q4 < big_fp / 3, (big_q4, big_fp)

# ---------------------------------------------------------------------------
# w4a8 (int4_w8a8: nibble-packed int4 weights + dynamic int8 activations)
# ---------------------------------------------------------------------------


def test_linear_w4a8_matches_manual_integer_math():
    """The s48 linear path must equal the explicit integer computation:
    per-row int8 activations x unpacked int4 nibbles, two int32 half-dots,
    fp32 epilogue by sx * s48 — bit-for-bit (all-integer dots)."""
    from deer_vla_tpu.ops.quant import quantize_weight4, unpack_int4
    r = np.random.RandomState(9)
    w = jnp.asarray(r.randn(128, 64).astype(np.float32)) * 0.05
    b = jnp.asarray(r.randn(64).astype(np.float32)) * 0.1
    x = jnp.asarray(r.randn(5, 128).astype(np.float32))
    q4, s = quantize_weight4(w)
    got = linear({"q4": q4, "s48": s, "b": b}, x)
    # manual replica in numpy
    xn = np.asarray(x, np.float32)
    sx = np.maximum(np.abs(xn).max(-1, keepdims=True) / 127.0, 1e-12)
    xi = np.clip(np.round(xn / sx), -127, 127).astype(np.int32)
    wq = np.asarray(unpack_int4(q4), np.int32)
    acc = xi @ wq
    want = acc.astype(np.float32) * sx * np.asarray(s) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
    # and close to the fp product (combined int4 weight + int8 act error)
    y = np.asarray(linear({"w": w, "b": b}, x))
    assert np.abs(np.asarray(got) - y).max() < 0.35


def test_quantize_tree_w4a8_mode_and_odd_k_fallback():
    """int4_w8a8 packs even-K weights as q4/s48; odd-K falls back to w8a8
    (q/s8) so every matmul in the tree still runs int8 activations."""
    from deer_vla_tpu.ops.quant import quantize_serving_stacked
    tree = {"blocks": {"mlp": {"w": jnp.ones((2, 16, 16))},
                       "odd": {"w": jnp.ones((2, 15, 16))}},
            "has_xattn": jnp.ones((2,), jnp.bool_)}
    out = quantize_serving_stacked(tree, "int4_w8a8")
    assert set(out["blocks"]["mlp"]) == {"q4", "s48"}
    assert set(out["blocks"]["odd"]) == {"q", "s8"}  # odd K -> w8a8
    assert tree_bytes(out["blocks"]) < tree_bytes(tree["blocks"]) / 3


def test_scan_policy_w4a8_serves(tiny_setup):
    """--quantize int4_w8a8 end-to-end through the while-loop engine: serves
    finite actions correlated with fp, same forced-depth exits, packed tree
    ~4x smaller than fp32 (int4 weight bytes dominate)."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = tiny_setup
    fp = ScanDeerPolicy(params, cfg)
    qq = ScanDeerPolicy(params, cfg, quantize="int4_w8a8")
    th = [-1e8] * (len(fp.exits) - 1) + [1e8]
    fp.set_thresholds(list(th)), qq.set_thresholds(list(th))
    for i in range(2):
        img, grip, ids, mask = _inputs(cfg, seed=60 + i)
        a = fp.step(img, grip, ids, mask)
        b = qq.step(img, grip, ids, mask)
        assert fp.last_exit_layer == qq.last_exit_layer
        assert np.isfinite(b).all()
        assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.8, (a, b)
    big_fp = sum(x.size * x.dtype.itemsize
                 for k in ("blocks", "xattn", "vit", "perceiver")
                 if k in fp.stacked
                 for x in jax.tree_util.tree_leaves(fp.stacked[k]))
    big_q = sum(x.size * x.dtype.itemsize
                for k in ("blocks", "xattn", "vit", "perceiver")
                if k in qq.stacked
                for x in jax.tree_util.tree_leaves(qq.stacked[k]))
    assert big_q < big_fp / 3, (big_q, big_fp)


def test_deer_policy_int4_uses_int4_weights(tiny_setup):
    """Regression: the host-bucketed DeerPolicy used to silently downgrade
    --quantize int4 to weight-only int8 (scale-key mapping dropped the s4
    case).  It must pack q4 weights and still serve."""
    from deer_vla_tpu.eval.policy import DeerPolicy
    cfg, params = tiny_setup
    pol = DeerPolicy(params, cfg, quantize="int4")
    qb = pol.params["decoder"]["blocks"][0]["wqkv"]
    assert set(qb) >= {"q4", "s4"}, set(qb)
    img, grip, ids, mask = _inputs(cfg, seed=61)
    pol.set_timestep(0)
    a = pol.step(img, grip, ids, mask)
    assert np.isfinite(np.asarray(a)).all()
