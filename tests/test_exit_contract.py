"""Quantitative calibrate->serve exit-distribution contract.

The paper's central quantitative claim: thresholds solved offline make the
*serving-time* exit mix match the target ``exit_ratio**k`` schedule
(reference value_net.py:206-272; the avg-exit budget printed at
eval_calvin.py:646-653).  These tests assert that contract numerically, end
to end, through the real engines:

  * on the calibration set itself the realized histogram equals the target
    probs exactly (up to floor rounding) — a property of the greedy solver;
  * served HELD-OUT data from the calibration distribution realizes the
    target within sampling noise (window-folded model: zero-carry
    calibration == zero-carry fresh-episode serving, so the match is tight);
  * streamed episodes (real LSTM carry) realize the target within a looser
    band — the carry-state mismatch the reference's random-prefix
    calibration only approximates;
  * the checks FAIL when thresholds are ignored (forced-earliest /
    forced-last) — the tests have power.

Note on the fixture: freshly initialized models have ZERO x-attn gates
(helpers.py:255-258 parity), which makes actions — and therefore exit
deltas — depend on the text alone (5 debug instructions -> 5 distinct
deltas, a degenerate distribution no quantile solver can transfer).  The
fixture opens the gates with random values to emulate a trained model's
vision-dependent, continuously spread deltas; the contract is about
quantile transfer, not about the specific weights.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.debug_data import DebugBatcher
from deer_vla_tpu.data.preprocess import clip_preprocess
from deer_vla_tpu.data.text import HashTokenizer, fixed_length
from deer_vla_tpu.eval.calibrate import generate_calibration_values
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.models.value_net import exit_probs, solve_thresholds

COMBOS = [(1.0, "exp"), (0.8, "exp"), (0.5, "exp"), (1.0, "gauss"),
          (1.0, "gamma")]


def open_gates(params, key, scale=0.5):
    """Emulate a trained model: move the tanh x-attn gates off their zero
    init so vision reaches the decoder and deltas spread per-sample."""
    for x in params["decoder"]["xattn"]:
        if x is None:
            continue
        key, k1, k2 = jax.random.split(key, 3)
        x["attn_gate"] = jax.random.normal(k1, (1,)) * scale
        x["ff_gate"] = jax.random.normal(k2, (1,)) * scale
    return params


def make_model(fusion_mode, window):
    cfg = deer_tiny(n_layers=8, window_size=window)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, fusion_mode=fusion_mode,
                              media_token_id=tok.media_token_id,
                              eoc_token_id=tok.eoc_token_id)
    params = open_gates(init_deer(jax.random.PRNGKey(0), cfg),
                        jax.random.PRNGKey(42))
    return cfg, tok, params


def batcher(cfg, tok, seed, batch=32, num=8):
    return DebugBatcher(cfg, tok, batch_size=batch, num_batches=num,
                        img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size,
                        seed=seed)


def simulate_exits(vals, exits, th):
    """Ground-truth realized exits from per-exit deltas + thresholds: first
    exit whose delta passes, last exit always fires (the engines' math)."""
    n = vals.shape[1]
    taken = np.full(n, exits[-1])
    done = np.zeros(n, bool)
    for k, e in enumerate(exits):
        t = 1e30 if k == len(exits) - 1 else th[e]
        m = (~done) & (vals[k] <= t)
        taken[m] = e
        done |= m
    return taken


def hist_of(exit_layers, exits):
    return np.array([np.mean(exit_layers == e) for e in exits])


def contract_gap(realized, probs, n):
    """Per-bin |realized - target| in units of the allowed tolerance
    max(3.5 * sample sigma, 2.5/n); > 1 means the contract is violated."""
    sigma = np.sqrt(probs * (1 - probs) / n)
    tol = np.maximum(3.5 * sigma, 2.5 / n)
    return float(np.max(np.abs(realized - probs) / tol))


@pytest.fixture(scope="module")
def folded():
    """vit_concat model + calibration values + held-out values: zero-carry
    calibration exactly matches zero-carry fresh-episode serving."""
    cfg, tok, params = make_model("vit_concat", window=2)
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cal = generate_calibration_values(params, cfg, batcher(cfg, tok, seed=0))
    held = generate_calibration_values(params, cfg,
                                       batcher(cfg, tok, seed=1000))
    assert len(np.unique(cal[0])) == cal.shape[1], \
        "degenerate deltas: gate opening failed"
    return cfg, tok, params, cal, held, ScanDeerPolicy(params, cfg)


@pytest.fixture(scope="module")
def streamed_setup():
    """post-mode model + calibration values for the streaming contract."""
    cfg, tok, params = make_model("post", window=4)
    cal = generate_calibration_values(params, cfg,
                                      batcher(cfg, tok, seed=0, batch=16))
    return cfg, tok, params, cal


@pytest.mark.parametrize("ratio,dist", COMBOS)
def test_on_calibration_realized_equals_target(folded, ratio, dist):
    """Solver property: applying the solved thresholds back to the
    calibration set realizes exactly floor(n*p_k) exits per stage."""
    cfg, tok, params, cal, _, _ = folded
    exits = list(cfg.all_exit_ids())
    th, probs = solve_thresholds(cal, ratio, exits, cfg.n_layers - 1,
                                 exit_dist=dist)
    realized = hist_of(simulate_exits(cal, exits, th), exits)
    n = cal.shape[1]
    # floor rounding puts up to a couple of samples in the last bin
    assert np.all(np.abs(realized - probs) <= 3.0 / n + 1e-9), \
        (dist, ratio, realized, probs)


@pytest.mark.parametrize("ratio,dist", COMBOS)
def test_served_heldout_matches_target(folded, ratio, dist):
    """Serve held-out calibration-distribution windows through the
    while-loop engine (fresh episode per window -> zero carry, matching the
    window-folded calibration): the realized per-exit histogram must match
    the solver's target probs within sampling noise, and the engine's exit
    choices must agree with the delta-derived ground truth."""
    cfg, tok, params, cal, held, pol = folded
    exits = list(cfg.all_exit_ids())
    th, probs = solve_thresholds(cal, ratio, exits, cfg.n_layers - 1,
                                 exit_dist=dist)
    pol.set_thresholds(th)

    served = []
    for batch in batcher(cfg, tok, seed=1000):
        stat = batch["rgb_static"].reshape(-1, *batch["rgb_static"].shape[2:])
        grip = batch["rgb_gripper"].reshape(-1,
                                            *batch["rgb_gripper"].shape[2:])
        img = clip_preprocess(jnp.asarray(stat),
                              cfg.vit.image_size)[:, None, None]
        gri = clip_preprocess(jnp.asarray(grip),
                              cfg.vit.image_size)[:, None, None]
        ids, mask = fixed_length(np.asarray(batch["input_ids"]),
                                 np.asarray(batch["attention_mask"]),
                                 cfg.text_len, 0)
        pol.reset()  # each held-out window = a fresh episode's first step
        _, el = pol.step_batch(img, gri, jnp.asarray(ids), jnp.asarray(mask))
        served.append(el)
    served = np.concatenate(served)
    n = served.size

    realized = hist_of(served, exits)
    gap = contract_gap(realized, probs, n)
    assert gap <= 1.0, (dist, ratio, realized, probs, gap)

    # engine exit choices == delta-derived ground truth (held-out deltas)
    expected = simulate_exits(held, exits, th)
    assert np.mean(served == expected) >= 0.99

    # avg exit layer ~= the solved budget (the eval_calvin.py:646-653
    # contract the BO objective consumes)
    budget = float((probs * (np.asarray(exits) + 1)).sum())
    assert abs(float(served.mean() + 1) - budget) <= 0.6


@pytest.mark.parametrize("ratio,dist", COMBOS)
def test_contract_detects_ignored_thresholds(folded, ratio, dist):
    """Power check: the same tolerance must FAIL for an engine that ignores
    thresholds (always-first / always-last exit)."""
    cfg, tok, params, cal, held, _ = folded
    exits = list(cfg.all_exit_ids())
    _, probs = solve_thresholds(cal, ratio, exits, cfg.n_layers - 1,
                                exit_dist=dist)
    n = held.shape[1]
    always_first = hist_of(simulate_exits(
        held, exits, {e: 1e30 for e in exits}), exits)
    always_last = hist_of(simulate_exits(
        held, exits, {e: -1e30 for e in exits}), exits)
    assert contract_gap(always_first, probs, n) > 1.0
    assert contract_gap(always_last, probs, n) > 1.0


def _stream_exits(policy_step, cfg, tok, n_streams, n_steps, seed=7):
    """Drive a batched engine with n_streams synthetic episode streams of
    calibration-distribution frames; returns all realized exit layers."""
    from deer_vla_tpu.data.debug_data import INSTRUCTIONS, TASKS
    r = np.random.RandomState(seed)
    texts = [INSTRUCTIONS[TASKS[i % len(TASKS)]] for i in range(n_streams)]
    ids, mask = tok(texts)
    ids, mask = fixed_length(ids, mask, cfg.text_len, 0)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    hw = cfg.vit.image_size
    ghw = cfg.gripper_res or hw  # native-res wrist tower when configured
    out = []
    for _ in range(n_steps):
        img = clip_preprocess(jnp.asarray(
            r.randint(0, 256, (n_streams, hw, hw, 3), np.uint8)),
            hw)[:, None, None]
        gri = clip_preprocess(jnp.asarray(
            r.randint(0, 256, (n_streams, ghw, ghw, 3), np.uint8)),
            ghw)[:, None, None]
        el = policy_step(img, gri, ids, mask)
        out.append(np.asarray(el))
    return np.stack(out)  # (T, B)


@pytest.mark.parametrize("engine", ["scan", "bucketed"])
def test_streamed_contract_loose(streamed_setup, engine):
    """Streaming post-mode serving (real LSTM carry) through BOTH dynamic
    engines: realized histogram matches the target within a loose band, the
    avg exit is near the budget, the deviation is REPRODUCIBLE (a stable
    regime bias, not engine noise), and a thresholds-ignoring engine fails.

    Why this regime is looser than the window-folded contract (measured,
    3 seeds x 16 streams x 32 steps at this tiny scale): calibration scores
    window positions with the trajectory's own warmed carry, while these
    synthetic streams feed i.i.d. random frames into a long-lived carry —
    a carry/frame-distribution mismatch that shifts the delta quantiles.
    The per-bin deviation is a stable bias (e.g. [.06, .16, .02, .12] with
    cross-seed spread < .03), so more streams/steps cannot tighten it; the
    tests below bound the bias (per-bin + total-variation + budget) and
    separately assert the NOISE is small (disjoint stream sets reproduce
    the same histogram within a variance-derived tolerance)."""
    cfg, tok, params, cal = streamed_setup
    exits = list(cfg.all_exit_ids())
    th, probs = solve_thresholds(cal, 1.0, exits, cfg.n_layers - 1)

    if engine == "scan":
        from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
        pol = ScanDeerPolicy(params, cfg, thresholds=[th[e] for e in exits])

        def step(img, gri, ids, mask):
            _, el = pol.step_batch(img, gri, ids, mask)
            return el
    else:
        from deer_vla_tpu.eval.batched_policy import BatchedDeerPolicy
        pol = BatchedDeerPolicy(params, cfg, batch=12,
                                thresholds=[th[e] for e in exits])

        def step(img, gri, ids, mask):
            _, el = pol.step(img, gri, ids, mask)
            return el

    els = _stream_exits(step, cfg, tok, n_streams=12, n_steps=16)
    realized = hist_of(els.ravel(), exits)
    # bias bounds: per-bin + total variation (measured peak bias .17/.18 TV)
    assert np.all(np.abs(realized - probs) <= 0.2), (engine, realized, probs)
    assert 0.5 * float(np.abs(realized - probs).sum()) <= 0.25, \
        (engine, realized, probs)
    budget = float((probs * (np.asarray(exits) + 1)).sum())
    assert abs(float(els.mean() + 1) - budget) <= 0.6
    # power: degenerate histograms fail the same band
    for bad in (np.eye(len(exits))[0], np.eye(len(exits))[-1]):
        assert not np.all(np.abs(bad - probs) <= 0.2)

    # noise bound (variance-derived): a DISJOINT stream set must reproduce
    # the same realized histogram within 3.5x the cross-stream standard
    # error — a distorted/nondeterministic engine fails this even inside
    # the bias band above
    pol.reset()
    els2 = _stream_exits(step, cfg, tok, n_streams=12, n_steps=16, seed=1007)
    realized2 = hist_of(els2.ravel(), exits)
    per_stream = np.stack(
        [hist_of(e[:, b], exits) for e in (els, els2) for b in range(12)])
    se = per_stream.std(axis=0, ddof=1) / np.sqrt(12)
    tol = np.maximum(3.5 * np.sqrt(2.0) * se, 4.0 / els.size)
    assert np.all(np.abs(realized2 - realized) <= tol), \
        (engine, realized, realized2, tol)


# ---------------------------------------------------------------------------
# Approximate / quantized serving modes (VERDICT r3 item 3): the contract
# must hold in the configurations the throughput story actually ships, not
# just the exact bf16 tower:
#   tome      — calibration AND serving both run the token-merged tower
#               (cfg.vit.tome_r, ops/tome.py)
#   grip      — calibration AND serving both run the split-resolution
#               gripper tower (cfg.gripper_res; calibrate.py passes
#               gripper_size=cfg.gripper_res to the preprocess)
#   tome_grip — both approximations stacked (the "peak" configuration)
#   w8a8      — calibration runs fp and serving runs the int8xint8 tower:
#               that asymmetry IS the product flow (scan_policy.py:443-451
#               documents why thresholds are solved on the fp model), so
#               the contract is asserted exactly as shipped.
# ---------------------------------------------------------------------------

SERVING_MODES = ["tome", "grip", "tome_grip", "w8a8"]


def _mode_cfg(cfg, mode):
    """Config under which BOTH calibration and serving run for this mode
    (w8a8 keeps the exact cfg: quantization applies to the serving stack)."""
    if "tome" in mode:
        # tiny ViT has 5 tokens over 2 layers: r=1 merges one pair per
        # layer — same code path as r=8 at ViT-L scale
        cfg = dataclasses.replace(cfg, vit=dataclasses.replace(cfg.vit,
                                                               tome_r=1))
    if "grip" in mode:
        cfg = dataclasses.replace(cfg, gripper_res=14)
    return cfg


def _serve_heldout(pol, cfg, tok, th):
    """Serve the held-out windows (fresh episode each) and return exits."""
    pol.set_thresholds(th)
    ghw = cfg.gripper_res or cfg.vit.image_size
    served = []
    for batch in batcher(cfg, tok, seed=1000):
        stat = batch["rgb_static"].reshape(-1, *batch["rgb_static"].shape[2:])
        grip = batch["rgb_gripper"].reshape(-1,
                                            *batch["rgb_gripper"].shape[2:])
        img = clip_preprocess(jnp.asarray(stat),
                              cfg.vit.image_size)[:, None, None]
        gri = clip_preprocess(jnp.asarray(grip), ghw)[:, None, None]
        ids, mask = fixed_length(np.asarray(batch["input_ids"]),
                                 np.asarray(batch["attention_mask"]),
                                 cfg.text_len, 0)
        pol.reset()
        _, el = pol.step_batch(img, gri, jnp.asarray(ids), jnp.asarray(mask))
        served.append(el)
    return np.concatenate(served)


@pytest.mark.parametrize("mode", SERVING_MODES)
def test_contract_under_serving_modes(folded, mode):
    """Calibrate and serve in each shipping mode; the realized held-out
    histogram must match the solver target within the same power-checked
    tolerance as the exact tower, and the engine's exit choices must agree
    with the mode's delta-derived ground truth."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, tok, params, cal_exact, held_exact, pol_exact = folded
    exits = list(cfg.all_exit_ids())

    cfg_m = _mode_cfg(cfg, mode)
    if mode == "w8a8":
        cal_m, held_m = cal_exact, held_exact  # fp calibration (as shipped)
        pol_m = ScanDeerPolicy(params, cfg, quantize="int8_w8a8")
    else:
        cal_m = generate_calibration_values(params, cfg_m,
                                            batcher(cfg, tok, seed=0))
        held_m = generate_calibration_values(params, cfg_m,
                                             batcher(cfg, tok, seed=1000))
        assert len(np.unique(cal_m[0])) > len(exits), mode
        pol_m = ScanDeerPolicy(params, cfg_m)

    th, probs = solve_thresholds(cal_m, 1.0, exits, cfg.n_layers - 1)
    served = _serve_heldout(pol_m, cfg_m, tok, th)
    n = served.size

    realized = hist_of(served, exits)
    gap = contract_gap(realized, probs, n)
    assert gap <= 1.0, (mode, realized, probs, gap)

    # engine exit choices vs the mode's own delta ground truth
    expected = simulate_exits(held_m, exits, th)
    floor = 0.9 if mode == "w8a8" else 0.99  # int8 perturbs near-threshold
    agree = float(np.mean(served == expected))
    assert agree >= floor, (mode, agree)

    # power: the tolerance still rejects threshold-ignoring engines
    assert contract_gap(hist_of(simulate_exits(
        held_m, exits, {e: 1e30 for e in exits}), exits), probs, n) > 1.0

    if mode == "w8a8":
        # exit-choice agreement vs the fp exact tower on identical inputs
        # (the int8 exit-agreement metric bench.run_int8_agreement records
        # on hardware)
        served_fp = _serve_heldout(pol_exact, cfg, tok, th)
        assert float(np.mean(served == served_fp)) >= 0.9


def test_streamed_calibration_tightens_contract(streamed_setup):
    """--calib_streamed (value_net.generate_streamed_exit_deltas): deltas
    scored with ONE carry threaded across the window (plus a warm pass) and
    commit exits sampled from the target distribution must realize a
    MATERIALLY tighter streamed histogram than the folded random-prefix
    calibration — measured here: folded TV 0.15-0.18 / peak bin 0.14-0.16
    vs streamed(wr=1) TV ~0.065 / peak ~0.06 (2 seeds, 16x32 steps)."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.value_net import exit_probs
    cfg, tok, params, cal_folded = streamed_setup
    exits = list(cfg.all_exit_ids())
    target = exit_probs(len(exits), 1.0, "exp")
    cal_str = generate_calibration_values(
        params, cfg, batcher(cfg, tok, seed=0, batch=16),
        streamed=True, exit_sample_probs=list(target))

    def realized_of(cal):
        th, probs = solve_thresholds(cal, 1.0, exits, cfg.n_layers - 1)
        pol = ScanDeerPolicy(params, cfg,
                             thresholds=[th[e] for e in exits])

        def step(img, gri, ids, mask):
            _, el = pol.step_batch(img, gri, ids, mask)
            return el

        els = _stream_exits(step, cfg, tok, n_streams=16, n_steps=32)
        return hist_of(els.ravel(), exits), probs

    r_fold, p_fold = realized_of(cal_folded)
    r_str, p_str = realized_of(cal_str)
    tv_fold = 0.5 * float(np.abs(r_fold - p_fold).sum())
    tv_str = 0.5 * float(np.abs(r_str - p_str).sum())
    # absolute: streamed calibration meets a band the folded one cannot
    assert np.all(np.abs(r_str - p_str) <= 0.1), (r_str, p_str)
    assert tv_str <= 0.1, tv_str
    # comparative: a material improvement, not a tie
    assert tv_str < tv_fold - 0.03, (tv_str, tv_fold)


def test_streamed_calibration_composes_with_tome(streamed_setup):
    """The two opt-ins compose: calibrate streamed AND tome-merged, serve
    the same tome tower streaming — the realized mix must stay within the
    streamed-calibration band (slightly widened for the merge approx)."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.value_net import exit_probs
    cfg, tok, params, _ = streamed_setup
    cfg_m = dataclasses.replace(cfg, vit=dataclasses.replace(cfg.vit,
                                                             tome_r=1))
    exits = list(cfg_m.all_exit_ids())
    target = exit_probs(len(exits), 1.0, "exp")
    cal = generate_calibration_values(
        params, cfg_m, batcher(cfg, tok, seed=0, batch=16),
        streamed=True, exit_sample_probs=list(target))
    th, probs = solve_thresholds(cal, 1.0, exits, cfg_m.n_layers - 1)
    pol = ScanDeerPolicy(params, cfg_m, thresholds=[th[e] for e in exits])

    def step(img, gri, ids, mask):
        _, el = pol.step_batch(img, gri, ids, mask)
        return el

    els = _stream_exits(step, cfg_m, tok, n_streams=16, n_steps=32)
    realized = hist_of(els.ravel(), exits)
    assert np.all(np.abs(realized - probs) <= 0.12), (realized, probs)
    assert 0.5 * float(np.abs(realized - probs).sum()) <= 0.12


def test_streamed_calibration_composes_with_gripper_res(streamed_setup):
    """--calib_streamed + --gripper_res (the recommended-default pairing in
    README's decision rule): calibrate streamed with the native-res wrist
    tower, serve the same tower streaming — realized mix stays within the
    streamed-calibration band."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.value_net import exit_probs
    cfg, tok, params, _ = streamed_setup
    cfg_g = dataclasses.replace(cfg, gripper_res=14)
    exits = list(cfg_g.all_exit_ids())
    target = exit_probs(len(exits), 1.0, "exp")
    cal = generate_calibration_values(
        params, cfg_g, batcher(cfg, tok, seed=0, batch=16),
        streamed=True, exit_sample_probs=list(target))
    th, probs = solve_thresholds(cal, 1.0, exits, cfg_g.n_layers - 1)
    pol = ScanDeerPolicy(params, cfg_g, thresholds=[th[e] for e in exits])

    def step(img, gri, ids, mask):
        _, el = pol.step_batch(img, gri, ids, mask)
        return el

    els = _stream_exits(step, cfg_g, tok, n_streams=16, n_steps=32)
    realized = hist_of(els.ravel(), exits)
    assert np.all(np.abs(realized - probs) <= 0.12), (realized, probs)
    assert 0.5 * float(np.abs(realized - probs).sum()) <= 0.12


def test_streamed_calibration_composes_with_w8a8(streamed_setup):
    """--calib_streamed + --quantize int8_w8a8: calibration runs fp (as
    shipped — thresholds are solved on the fp model) and serving runs the
    int8 tower; the realized streamed mix must stay within a band widened
    for int8's near-threshold perturbation."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.value_net import exit_probs
    cfg, tok, params, _ = streamed_setup
    exits = list(cfg.all_exit_ids())
    target = exit_probs(len(exits), 1.0, "exp")
    cal = generate_calibration_values(
        params, cfg, batcher(cfg, tok, seed=0, batch=16),
        streamed=True, exit_sample_probs=list(target))
    th, probs = solve_thresholds(cal, 1.0, exits, cfg.n_layers - 1)
    pol = ScanDeerPolicy(params, cfg, quantize="int8_w8a8")
    pol.set_thresholds([th[e] for e in exits])

    def step(img, gri, ids, mask):
        _, el = pol.step_batch(img, gri, ids, mask)
        return el

    els = _stream_exits(step, cfg, tok, n_streams=16, n_steps=32)
    realized = hist_of(els.ravel(), exits)
    assert np.all(np.abs(realized - probs) <= 0.15), (realized, probs)
    assert 0.5 * float(np.abs(realized - probs).sum()) <= 0.15


def test_streamed_calibration_refuses_window_folded():
    """vit_concat folds the window into media tokens — no stream exists to
    calibrate; the generator must refuse loudly (use --calib_warm there)."""
    from deer_vla_tpu.models.value_net import generate_streamed_exit_deltas
    cfg, tok, params = make_model("vit_concat", window=2)
    fake = jnp.zeros((cfg.n_layers + 1, 4, 3, cfg.mpt.d_model))
    with pytest.raises(ValueError, match="streamed calibration"):
        generate_streamed_exit_deltas(params["extra_exit"], fake, cfg,
                                      list(cfg.all_exit_ids()))
    # use_hist serves the FULL-window head each step — no streamed carry
    # regime exists to match; refuse rather than calibrate a regime the
    # engine never runs
    cfg_h, tok_h, params_h = make_model("post", window=2)
    cfg_h = dataclasses.replace(cfg_h, use_hist=True)
    with pytest.raises(ValueError, match="use_hist"):
        generate_streamed_exit_deltas(params_h["extra_exit"], fake, cfg_h,
                                      list(cfg_h.all_exit_ids()))


def test_engines_agree_on_exit_choices(streamed_setup):
    """The while-loop and host-bucketed engines must realize (nearly)
    identical per-step exit choices on identical streams — the exit-choice
    analogue of the action engine-equivalence matrix."""
    from deer_vla_tpu.eval.batched_policy import BatchedDeerPolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    cfg, tok, params, cal = streamed_setup
    exits = list(cfg.all_exit_ids())
    th, _ = solve_thresholds(cal, 1.0, exits, cfg.n_layers - 1)

    pol_a = ScanDeerPolicy(params, cfg, thresholds=[th[e] for e in exits])
    pol_b = BatchedDeerPolicy(params, cfg, batch=8,
                              thresholds=[th[e] for e in exits])

    def step_a(img, gri, ids, mask):
        _, el = pol_a.step_batch(img, gri, ids, mask)
        return el

    def step_b(img, gri, ids, mask):
        _, el = pol_b.step(img, gri, ids, mask)
        return el

    els_a = _stream_exits(step_a, cfg, tok, n_streams=8, n_steps=12)
    els_b = _stream_exits(step_b, cfg, tok, n_streams=8, n_steps=12)
    agree = float(np.mean(els_a == els_b))
    assert agree >= 0.97, agree
