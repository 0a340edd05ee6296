"""Benchmark: DeeR-B (3B) dynamic-early-exit streaming inference on one TPU chip.

Metric: actions/sec/chip for the product inference path (BASELINE.json) —
dual-camera ViT-L encode + perceiver + N-layer MPT-flamingo decode + exit
head — averaged over the DeeR exit-layer distribution (exp, exit_ratio 0.8,
the paper's CALVIN-D operating point; README.md:111-127).

Execution model measured: the while-loop single-program dynamic exit
(eval/scan_policy.py) — one lax.while_loop over stacked decoder layers with
the exit predicate evaluated on device, ONE dispatch per action, zero host
round-trips inside the decision, and compile time constant in depth.
Per-depth cost is measured by driving the same compiled program with runtime
thresholds that force each exit depth; the reported value is the expectation
of throughput under the exit distribution.

vs_baseline anchor: the reference publishes no actions/sec; from its eval
cost (1000 sequences in ~4.5 h on 8x V100, README.md:126; ~650 env steps per
sequence) the per-GPU policy rate is ~4 actions/s.  vs_baseline = ours / 4.
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_ACTIONS_PER_SEC = 4.0

# DEER_BENCH_MODEL=mpt_9b benches the truncated 9B (DeeR-B on MPT-7B)
BENCH_MODEL = os.environ.get("DEER_BENCH_MODEL", "mpt_dolly_3b")

# wall-clock budget for OPTIONAL sections (tome/grip/w8a8/peak/int8/train/
# 9B): each checks remaining budget before starting and records a skip.
# The backend wait counts against the SAME budget (BENCH_r03 lesson: the
# driver killed a ~33min run at rc=124 with zero output), and the headline
# JSON line is now emitted INCREMENTALLY — right after the core serving
# measurement and again after every section — so a driver kill at any point
# leaves the freshest complete artifact as the last parseable stdout line.
# That makes the budget a wasted-work bound, not an artifact-safety bound:
# it is sized so the nested 9B capacity sweep (the last, most expensive
# section) still gets attempted on a healthy tunnel.  Round-5 sizing: the
# full path (3B + decomposition + agreement + calibration + b48 + train +
# pipeline + 9B) measured ~55 min end-to-end on a healthy tunnel — an
# under-sized budget would VOLUNTARILY skip the 9B tail that incremental
# emission makes safe to attempt (each nested 9B section merges into the
# artifact as it lands, so even a mid-9B kill keeps the completed modes).
BUDGET_S = float(os.environ.get("DEER_BENCH_BUDGET_S", "4200"))
_START = time.time()

# belt-and-braces trail: every emit() also rewrites this file on disk
PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "runs", "bench_partial.json")


def over_budget(margin_s: float) -> bool:
    """True when starting a section estimated at margin_s would overrun."""
    return time.time() - _START > BUDGET_S - margin_s


def emit(result: dict) -> None:
    """Print the parseable artifact line NOW and mirror it to disk.

    The driver records the last parseable stdout line; emitting after the
    core measurement and after each optional section means a mid-run kill
    (BENCH_r03: rc=124, parsed null) can only lose the *in-flight* section,
    never the whole run.

    SIZE contract (VERDICT r4 item 1): the full artifact grew past the
    driver's ~3.5 KB stdout-tail window (BENCH_r04: rc=0 but parsed=null —
    a front-truncated fragment).  So every emission prints the full line
    (human/debug trail + disk mirror) FOLLOWED by a compact (<1 KB) summary
    line carrying the headline scalars and a pointer to the full artifact
    on disk — the last parseable stdout line now always fits any tail
    window.  tests/test_bench_emit.py pins both the ordering and the
    size bound."""
    line = json.dumps(result)
    print(line, flush=True)
    try:
        os.makedirs(os.path.dirname(PARTIAL_PATH), exist_ok=True)
        with open(PARTIAL_PATH, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    if "detail" in result:
        print(json.dumps(compact_summary(result)), flush=True)


def _dig(d, *path):
    """Nested dict get; None on any miss/non-dict."""
    for p in path:
        if not isinstance(d, dict):
            return None
        d = d.get(p)
    return d


def compact_summary(result: dict) -> dict:
    """The <1 KB driver-parseable digest of a (possibly 3.6 KB+) artifact.

    Flat scalars only — one key per headline number the judge compares
    across rounds — plus detail_file pointing at the byte-complete mirror.
    Hard-bounded: drops trailing summary keys if the line would ever exceed
    900 bytes (it doesn't today; the bound is a safety valve)."""
    out = {"metric": result.get("metric"), "value": result.get("value"),
           "unit": result.get("unit"),
           "vs_baseline": result.get("vs_baseline"),
           "detail_file": "runs/bench_partial.json"}
    if "error" in result:
        out["error"] = str(result["error"])[:200]
    d = result.get("detail")
    if not isinstance(d, dict):
        return out
    s = {}

    def put(k, v, nd=2):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            s[k] = round(float(v), nd)

    put("full_depth_aps", d.get("full_depth_actions_per_sec"))
    put("batched32_aps", d.get("batched32_full_depth_actions_per_sec"))
    put("avg_exit_layer", d.get("avg_exit_layer"))
    put("dyn_mfu", _dig(d, "dynamic_mfu", "mfu"), 3)
    put("b32_mfu", _dig(d, "batched32_mfu", "mfu"), 3)
    put("tome8_aps", _dig(d, "batched32_tome8", "actions_per_sec"))
    put("grip84_aps", _dig(d, "batched32_grip84", "actions_per_sec"))
    put("w8a8_aps", _dig(d, "batched32_w8a8", "actions_per_sec"))
    put("w8a8_x", _dig(d, "batched32_w8a8", "speedup_vs_bf16"), 3)
    put("peak_aps", _dig(d, "batched32_w8a8", "stacked_peak_tome8_grip84",
                         "actions_per_sec"))
    put("peak48_aps", _dig(d, "batched32_w8a8", "stacked_peak_tome8_grip84",
                           "b48", "actions_per_sec"))
    put("w8a8_mix_mfu", _dig(d, "batched32_w8a8", "decomposition",
                             "configs", "w8a8_full", "mixed_mfu"), 3)
    put("w8a8_dec_aps", _dig(d, "batched32_w8a8", "decomposition",
                             "configs", "w8a8_decoder_only",
                             "actions_per_sec"))
    put("int8_aps", _dig(d, "int8", "actions_per_sec"))
    put("int8_agree", _dig(d, "int8", "exit_agreement", "exit_agreement"), 4)
    hist = _dig(d, "int8", "exit_agreement", "fp_exit_hist")
    if isinstance(hist, list):
        s["int8_hist_bins"] = int(sum(1 for h in hist if h))
    put("calib_folded_tv", _dig(d, "calibration", "folded_tv"), 4)
    put("calib_streamed_tv", _dig(d, "calibration", "streamed_tv"), 4)
    if _dig(d, "calibration", "serving_mix_degenerate"):
        s["calib_degen"] = True  # TVs don't discriminate regimes (note)
    put("train_sps", _dig(d, "train_3b", "samples_per_sec"))
    put("train_mfu", _dig(d, "train_3b", "mfu"), 3)
    put("pipe_mfu", _dig(d, "train_pipeline", "mfu"), 3)
    put("loader_idle_ms", _dig(d, "train_pipeline",
                               "loader_idle_ms_per_step"))
    n9 = d.get("mpt_9b")
    if isinstance(n9, dict):
        put("9b_aps", n9.get("actions_per_sec"))
        put("9b_full_aps", n9.get("full_depth_actions_per_sec"))
        m9 = n9.get("modes")
        put("9b_bf16_aps", _dig(m9, "bf16", "full_depth_actions_per_sec"))
        put("9b_w8a8_aps", _dig(m9, "int8_w8a8",
                                "full_depth_actions_per_sec"))
        put("9b_w4a8_aps", _dig(m9, "int4_w8a8",
                                "full_depth_actions_per_sec"))
        put("9b_bf16_mb", _dig(m9, "bf16", "resident_weights_mb"), 0)
        put("9b_w8a8_mb", _dig(m9, "int8_w8a8", "resident_weights_mb"), 0)
        put("9b_b32_aps", _dig(m9, "int8_w8a8",
                               "batched32_full_depth_actions_per_sec"))
        put("9b_peak_aps", _dig(m9, "int8_w8a8", "stacked_peak_tome8_grip84",
                                "batched32_full_depth_actions_per_sec"))
    out["summary"] = s
    while len(json.dumps(out)) > 900 and s:
        s.pop(next(reversed(s)))  # safety valve; never hit today
    return out


def tree_mb(tree) -> float:
    """Resident bytes of a device pytree, MB (the int4 capacity metric)."""
    from deer_vla_tpu.ops.quant import tree_bytes
    return round(tree_bytes(tree) / 1e6, 1)


# one-chip peak dense-matmul throughput by device kind (bf16), TFLOP/s.
# Source: public TPU spec sheets; int8 peak is 2x bf16 on v5e/v6e MXUs.
PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v5": 197.0,
    "TPU v5p": 459.0, "TPU v4": 275.0, "TPU v4 lite": 137.5,
    "TPU v6 lite": 918.0, "TPU v6e": 918.0,
}


def peak_tflops() -> float:
    """bf16 peak of the attached chip, or 0.0 when unknown (CPU runs)."""
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16_TFLOPS.items():
        if kind.startswith(k):
            return v
    return 0.0


def mfu_fields(gflops_per_unit: float, seconds_per_unit: float,
               peak: float, int8_peak: bool = False) -> dict:
    """Chip-weather-independent accounting for one measured section
    (VERDICT r2 item 2): analytic FLOPs per action/sample, achieved
    TFLOP/s, MFU vs the one-chip peak, and the compute-floor latency the
    analytic FLOPs imply at peak.  Convention: model FLOPs (2*MAC), remat
    recompute NOT counted — the standard MFU definition."""
    if seconds_per_unit <= 0:
        return {}
    achieved = gflops_per_unit / seconds_per_unit / 1e3  # TFLOP/s
    out = {"gflops_per_unit": round(gflops_per_unit, 2),
           "achieved_tflops": round(achieved, 2)}
    p = peak * (2.0 if int8_peak else 1.0)
    if p > 0:
        out["mfu"] = round(achieved / p, 4)
        out["floor_ms"] = round(1000 * gflops_per_unit / (p * 1e3), 3)
    return out


def mixed_mfu_fields(cfg, exit_layer: int, seconds_per_action: float,
                     peak: float, precisions: dict) -> dict:
    """Per-precision MFU accounting for a MIXED-precision step (VERDICT r4
    item 5).  `mfu_fields` scores the whole step against ONE peak, which
    misleads when precisions mix — BENCH_r04 scored the w8a8 batched step
    (whose analytic FLOPs are part bf16-era vision, part int8 decoder)
    against the doubled int8 peak and read 0.297 "MFU".  Here each
    component's analytic FLOPs (eval/flops.py split: dual-camera
    vision+perceiver / decoder-to-exit / head) are scored against the peak
    of the precision it actually computes in; the per-component floors sum
    to the mixed compute floor and mixed_mfu = floor / measured.

    precisions: {"vision"|"decoder"|"head": "bf16"|"int8"}."""
    from deer_vla_tpu.eval.flops import (head_flops, llm_flops_per_exit,
                                         vision_flops)
    g = {"vision": vision_flops(cfg) / 1e9,
         "decoder": llm_flops_per_exit(cfg)[exit_layer],
         "head": head_flops(cfg) / 1e9}
    # 6 decimals: the tiny CPU-test model's head is O(1e-5) GFLOPs and
    # coarser rounding zeroed it (3B values are O(0.1-100))
    out = {"gflops_split": {k: round(v, 6) for k, v in g.items()}}
    if peak <= 0 or seconds_per_action <= 0:
        return out
    floor_s = sum(
        g[c] / (peak * (2.0 if precisions[c] == "int8" else 1.0) * 1e3)
        for c in g)
    out["precisions"] = dict(precisions)
    out["mixed_floor_ms"] = round(1000 * floor_s, 6)
    out["mixed_mfu"] = round(floor_s / seconds_per_action, 4)
    return out


def run_model(bench_model: str, emit_cb=None) -> dict:
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import exit_probs

    BENCH_MODEL = bench_model
    if BENCH_MODEL == "mpt_9b":
        # truncated 9B on one 16GB chip: init params directly in bf16
        from deer_vla_tpu.core.config import DTypePolicy
        cfg = MODEL_REGISTRY[BENCH_MODEL](
            max_layer=12,
            dtypes=DTypePolicy(param_dtype="bfloat16",
                               compute_dtype="bfloat16"))
    elif BENCH_MODEL == "tiny":
        cfg = MODEL_REGISTRY["tiny"]()  # CPU smoke of the bench structure
    else:
        cfg = MODEL_REGISTRY[BENCH_MODEL](max_layer=12)  # DeeR-B
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    exits = list(cfg.all_exit_ids())
    policy = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits))
    if BENCH_MODEL == "mpt_9b":
        # HBM headroom: pack=True's pruned tree holds no per-layer original
        # references, so dropping ours frees the unstacked decoder + ViT
        # blocks (the old drop_unstacked role)
        del params

    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    # DISTINCT image per timing iteration: the runtime deduplicates
    # identical repeat dispatches (identical program + argument buffers
    # return without re-execution), which would fake the measurement —
    # a chained LSTM carry alone is not protection once it converges
    N_POOL = 40
    img_pool = [jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
                for _ in range(N_POOL)]
    img = img_pool[0]
    grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)

    def force_depth_thresholds(k):
        return [-1e8] * k + [1e8] * (len(exits) - k)

    def full_thresholds(k):
        import numpy as _np
        th = _np.full(cfg.n_layers, -1e30, _np.float32)
        for e in exits:
            th[e] = -1e8
        th[exits[k]] = 1e30
        return jnp.asarray(th)

    from deer_vla_tpu.ops.lstm import zero_carry

    def time_depth(k, iters=30, warmup=5, p=None):
        """Device-pipelined timing: chain `iters` fused steps through the
        on-device carry WITHOUT reading the action back each step, then sync
        once.  This measures the framework's per-action device cost; the
        host-readback-per-step cost (pure transport, huge variance on
        tunneled chips) is reported separately as sync_step_ms."""
        p = p or policy
        th = full_thresholds(k)
        carry = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                           jnp.float32)
        for i in range(warmup):
            arm, gp, carry, el = p._step(p.params, p.stacked,
                                         img_pool[i % N_POOL], grip,
                                         ids, mask, carry, th)
        jax.block_until_ready((arm, gp, carry, el))
        assert int(el[0]) == exits[k], (int(el[0]), exits[k])
        t0 = time.perf_counter()
        for i in range(iters):
            arm, gp, carry, el = p._step(p.params, p.stacked,
                                         img_pool[i % N_POOL], grip,
                                         ids, mask, carry, th)
        jax.block_until_ready((arm, gp, carry, el))
        return (time.perf_counter() - t0) / iters

    # synchronous single-step (includes one device->host action readback)
    def time_sync_step(iters=10):
        policy.set_thresholds(force_depth_thresholds(len(exits) - 1))
        policy.reset()
        policy.step(img, grip, ids, mask)
        t0 = time.perf_counter()
        for i in range(iters):
            policy.step(img_pool[i % N_POOL], grip, ids, mask)
        return (time.perf_counter() - t0) / iters

    probs = exit_probs(len(exits), 0.8, "exp")
    trace_dir = os.environ.get("DEER_BENCH_PROFILE", "")
    if trace_dir:
        from deer_vla_tpu.utils.profiling import trace
        with trace(trace_dir):
            per_depth_t = np.array([time_depth(k) for k in range(len(exits))])
    else:
        per_depth_t = np.array([time_depth(k) for k in range(len(exits))])
    expected_t = float((probs * per_depth_t).sum())
    aps = 1.0 / expected_t
    aps_full = 1.0 / per_depth_t[-1]

    # analytic FLOPs / MFU accounting (eval/flops.py): makes the numbers
    # comparable across rounds despite the time-shared chip (CLAUDE.md:
    # 15-195 ms/step session variance) — MFU moves only when the CODE does
    from deer_vla_tpu.eval.flops import full_step_flops
    peak = peak_tflops()
    per_depth_gflops = np.array([full_step_flops(cfg, e) for e in exits])
    expected_gflops = float((probs * per_depth_gflops).sum())
    # measure the sync step NOW, while only `policy` holds device memory —
    # the batched and int8 engines below each stack their own weight trees
    # and the three together (plus fp32 params) don't fit a 16GB chip
    sync_step_ms = round(1000 * time_sync_step(), 2)
    avg_exit_layer = float((probs * (np.array(exits) + 1)).sum())

    # core headline result — built and EMITTED before any optional section
    # so a driver kill can never again leave parsed=null (VERDICT r3 item 1)
    short = "3b" if BENCH_MODEL == "mpt_dolly_3b" else BENCH_MODEL
    result = {
        "metric": f"deer_b_{short}_dynamic_exit_actions_per_sec_per_chip",
        "value": round(aps, 2),
        "unit": "actions/s",
        "vs_baseline": round(aps / REFERENCE_ACTIONS_PER_SEC, 2),
        "detail": {
            "full_depth_actions_per_sec": round(aps_full, 2),
            "batched32_full_depth_actions_per_sec": 0.0,
            "avg_exit_layer": round(avg_exit_layer, 2),
            "per_depth_ms": [round(1000 * t, 2) for t in per_depth_t],
            "sync_step_ms": sync_step_ms,
            "execution_model": "while_loop_single_program",
            "backend": jax.default_backend(),
            "peak_bf16_tflops": peak,
            "per_depth_gflops_per_action":
                [round(float(g), 2) for g in per_depth_gflops],
            "dynamic_mfu": mfu_fields(expected_gflops, expected_t, peak),
            "full_depth_mfu": mfu_fields(float(per_depth_gflops[-1]),
                                         float(per_depth_t[-1]), peak),
            "batched32_mfu": {},
        },
    }
    detail = result["detail"]

    def section_done():
        if emit_cb is not None:
            emit_cb(result)

    section_done()

    # batched serving throughput: 32 parallel streams through the SAME
    # while-loop program (one dispatch per step, per-stream dynamic exits);
    # measured at full depth, device-pipelined like time_depth (the
    # per-step host readback is pure tunnel transport, reported separately
    # via sync_step_ms)
    batched_aps = 0.0
    batched_w8a8 = {}
    batched_tome = {}
    batched_grip = {}
    if BENCH_MODEL != "mpt_9b":  # 9B keeps HBM headroom for stacked weights
        B = 32
        bp = ScanDeerPolicy(params, cfg,
                            thresholds=[-1e8] * (len(exits) - 1) + [1e8])
        iters_b, warm_b = 20, 3
        # a DISTINCT image for every dispatch, warmup included — a cycled
        # pool can settle into a bit-exact limit cycle and dedupe
        imgB_pool = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
                     for _ in range(iters_b + warm_b)]
        idsB = np.full((B, s), 11, np.int32)
        idsB[:, 0] = cfg.media_token_id
        idsB = jnp.asarray(idsB)
        maskB = jnp.ones((B, s), jnp.int32)
        thB = full_thresholds(len(exits) - 1)
        carryB = zero_carry(cfg.head.lstm_num_layers, B,
                            cfg.head.hidden_size, jnp.float32)
        for i in range(warm_b):
            armB, gpB, carryB, elB = bp._step(bp.params, bp.stacked,
                                              imgB_pool[i], imgB_pool[i],
                                              idsB, maskB, carryB, thB)
        jax.block_until_ready((armB, gpB, carryB, elB))
        assert int(elB[0]) == exits[-1]
        t0 = time.perf_counter()
        for i in range(warm_b, warm_b + iters_b):
            armB, gpB, carryB, elB = bp._step(bp.params, bp.stacked,
                                              imgB_pool[i], imgB_pool[i],
                                              idsB, maskB, carryB, thB)
        jax.block_until_ready((armB, gpB, carryB, elB))
        batched_aps = B * iters_b / (time.perf_counter() - t0)
        detail["batched32_full_depth_actions_per_sec"] = round(batched_aps, 2)
        detail["batched32_mfu"] = mfu_fields(float(per_depth_gflops[-1]),
                                             1.0 / batched_aps, peak)
        section_done()

        del imgB_pool, carryB, armB, gpB, elB  # HBM headroom for A/Bs below
        from types import SimpleNamespace
        iters_w, warm_w = 10, 3

        def time_b(p, pool):
            c = zero_carry(cfg.head.lstm_num_layers, B,
                           cfg.head.hidden_size, jnp.float32)
            for i in range(warm_w):
                a_, g_, c, e_ = p._step(p.params, p.stacked, pool[i],
                                        pool[i], idsB, maskB, c, thB)
            jax.block_until_ready((a_, g_, c, e_))
            t0 = time.perf_counter()
            for i in range(warm_w, warm_w + iters_w):
                a_, g_, c, e_ = p._step(p.params, p.stacked, pool[i],
                                        pool[i], idsB, maskB, c, thB)
            jax.block_until_ready((a_, g_, c, e_))
            return (time.perf_counter() - t0) / iters_w

        # ToMe batched serving (--vit_tome_r 8, ops/tome.py): the B=32 step
        # is COMPUTE-bound (~50% MFU), so the -36% analytic-FLOPs merge cut
        # translates ~1:1 (scripts/bench_tome.py measured 1.41x).  The tome
        # engine shares bp's packed weights (ToMe is weight-free) — only a
        # second program compiles.  Approximate accel: the HEADLINE value
        # stays the exact tower; this section records the opt-in gain.
        batched_tome = {}
        if os.environ.get("DEER_BENCH_TOME", "1") != "0" and over_budget(300):
            batched_tome = {"skipped": "time budget"}
        elif os.environ.get("DEER_BENCH_TOME", "1") != "0":
            try:
                import dataclasses as _dc

                from deer_vla_tpu.eval.scan_policy import build_scan_step
                cfg_t = _dc.replace(cfg, vit=_dc.replace(cfg.vit, tome_r=8))
                tm = SimpleNamespace(
                    params=bp.params, stacked=bp.stacked,
                    _step=build_scan_step(cfg_t, exits, "L2", None)[0])
                imgT = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
                        for _ in range(2 * (iters_w + warm_w))]
                t_tm = time_b(tm, imgT[:iters_w + warm_w])
                t_bf2 = time_b(bp, imgT[iters_w + warm_w:])
                g_t = full_step_flops(cfg_t, exits[-1])
                batched_tome = {
                    "r": 8,
                    "actions_per_sec": round(B / t_tm, 2),
                    "bf16_exact_adjacent_actions_per_sec":
                        round(B / t_bf2, 2),
                    "speedup_vs_exact": round(t_bf2 / t_tm, 3),
                    "analytic_flops_ratio":
                        round(g_t / float(per_depth_gflops[-1]), 3),
                    **mfu_fields(g_t, t_tm / B, peak),
                }
                del tm, imgT
            except Exception as e:
                batched_tome = {"error": repr(e)[:200]}
        if batched_tome:
            detail["batched32_tome8"] = batched_tome
            section_done()

        # native-res gripper at batch (--gripper_res 84, cfg.gripper_res):
        # the wrist camera runs the shared tower at CALVIN's native 84
        # (pos-embeds interpolated) instead of the reference's 224 upsample
        # — -41% analytic FLOPs/action, and the B=32 step is compute-bound
        # so it converts >1:1 (scripts/bench_gripper_res.py measured 1.67x
        # full-depth).  Shares bp's weights; only a second program + the
        # 84-res gripper input differ.
        def time_bg(p, pool, gripv):
            c = zero_carry(cfg.head.lstm_num_layers, B,
                           cfg.head.hidden_size, jnp.float32)
            for i in range(warm_w):
                a_, g_, c, e_ = p._step(p.params, p.stacked, pool[i],
                                        gripv, idsB, maskB, c, thB)
            jax.block_until_ready((a_, g_, c, e_))
            t0 = time.perf_counter()
            for i in range(warm_w, warm_w + iters_w):
                a_, g_, c, e_ = p._step(p.params, p.stacked, pool[i],
                                        gripv, idsB, maskB, c, thB)
            jax.block_until_ready((a_, g_, c, e_))
            return (time.perf_counter() - t0) / iters_w

        batched_grip = {}
        GRIP_RES = 84
        if os.environ.get("DEER_BENCH_GRIP", "1") != "0" and over_budget(300):
            batched_grip = {"skipped": "time budget"}
        elif (os.environ.get("DEER_BENCH_GRIP", "1") != "0"
              and GRIP_RES % cfg.vit.patch_size == 0):
            try:
                import dataclasses as _dc

                from deer_vla_tpu.eval.scan_policy import build_scan_step
                cfg_g = _dc.replace(cfg, gripper_res=GRIP_RES)
                gr = SimpleNamespace(
                    params=bp.params, stacked=bp.stacked,
                    _step=build_scan_step(cfg_g, exits, "L2", None)[0])
                gripG = jnp.asarray(
                    r.randn(B, 1, 1, 3, GRIP_RES, GRIP_RES), jnp.float32)
                imgG = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
                        for _ in range(2 * (iters_w + warm_w))]
                t_g = time_bg(gr, imgG[:iters_w + warm_w], gripG)
                t_bf3 = time_b(bp, imgG[iters_w + warm_w:])
                g_g = full_step_flops(cfg_g, exits[-1])
                batched_grip = {
                    "res": GRIP_RES,
                    "actions_per_sec": round(B / t_g, 2),
                    "bf16_exact_adjacent_actions_per_sec":
                        round(B / t_bf3, 2),
                    "speedup_vs_exact": round(t_bf3 / t_g, 3),
                    "analytic_flops_ratio":
                        round(g_g / float(per_depth_gflops[-1]), 3),
                    **mfu_fields(g_g, t_g / B, peak),
                }
                del gr, imgG, gripG
            except Exception as e:
                batched_grip = {"error": repr(e)[:200]}
        if batched_grip:
            detail["batched32_grip84"] = batched_grip
            section_done()

        # w8a8 at batch (--quantize int8_w8a8): the B=32 step is
        # COMPUTE-bound, so int8 x int8 MXU matmuls (2x bf16 MXU on v5e)
        # are the lever weight-only int8 isn't.  Same-process adjacent
        # A/B: re-time bf16 next to the w8a8 run (time-shared chip).
        batched_w8a8 = {}
        w8 = None
        if os.environ.get("DEER_BENCH_W8A8", "1") != "0" and over_budget(240):
            batched_w8a8 = {"skipped": "time budget"}
        elif os.environ.get("DEER_BENCH_W8A8", "1") != "0":
            try:
                from deer_vla_tpu.ops.quant import quantize_serving_stacked
                w8_try = SimpleNamespace(
                    params=bp.params,
                    stacked=quantize_serving_stacked(bp.stacked,
                                                     "int8_w8a8"),
                    _step=bp._step)
                # small distinct-image pools: 2*(10+3) B=32 fp32 frames is
                # ~0.5 GB — 100 would be ~2 GB of HBM on top of 3 stacks
                imgW = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw),
                                    jnp.float32)
                        for _ in range(2 * (iters_w + warm_w))]
                t_w8 = time_b(w8_try, imgW[:iters_w + warm_w])
                t_bf = time_b(bp, imgW[iters_w + warm_w:])
                batched_w8a8 = {
                    "actions_per_sec": round(B / t_w8, 2),
                    "bf16_adjacent_actions_per_sec": round(B / t_bf, 2),
                    "speedup_vs_bf16": round(t_bf / t_w8, 3),
                    # int8 x int8 rides the 2x MXU path -> int8 peak basis
                    **mfu_fields(float(per_depth_gflops[-1]), t_w8 / B,
                                 peak, int8_peak=True),
                }
                w8 = w8_try
                del imgW
            except Exception as e:
                batched_w8a8 = {"error": repr(e)[:200]}
        if batched_w8a8:
            detail["batched32_w8a8"] = batched_w8a8
            section_done()
        # stacked one-chip peak: tome8 + grip84 share the SAME quantized
        # tree (both accels are weight-free) — the highest measured
        # throughput configuration (scripts/bench_gripper_res.py --batch 32
        # --tome_r 8 --quantize int8_w8a8: 431 -> 680 actions/s).  In its
        # OWN try so a peak-section flake can never erase the measured
        # w8a8 dict (VERDICT r3 item 4).
        if (w8 is not None
                and os.environ.get("DEER_BENCH_PEAK", "1") != "0"
                and over_budget(240)):
            batched_w8a8["stacked_peak_tome8_grip84"] = {
                "skipped": "time budget"}
            section_done()
        elif (w8 is not None
                and os.environ.get("DEER_BENCH_PEAK", "1") != "0"
                and 84 % cfg.vit.patch_size != 0):
            batched_w8a8["stacked_peak_tome8_grip84"] = {
                "skipped": "patch size"}
            section_done()
        elif (w8 is not None
                and os.environ.get("DEER_BENCH_PEAK", "1") != "0"):
            try:
                import dataclasses as _dc

                from deer_vla_tpu.eval.scan_policy import build_scan_step
                cfg_p = _dc.replace(
                    cfg, gripper_res=84,
                    vit=_dc.replace(cfg.vit, tome_r=8))
                pk = SimpleNamespace(
                    params=w8.params, stacked=w8.stacked,
                    _step=build_scan_step(cfg_p, exits, "L2", None)[0])
                gripP = jnp.asarray(r.randn(B, 1, 1, 3, 84, 84),
                                    jnp.float32)
                imgP = [jnp.asarray(r.randn(B, 1, 1, 3, hw, hw),
                                    jnp.float32)
                        for _ in range(iters_w + warm_w)]
                t_pk = time_bg(pk, imgP, gripP)
                g_p = full_step_flops(cfg_p, exits[-1])
                batched_w8a8["stacked_peak_tome8_grip84"] = {
                    "actions_per_sec": round(B / t_pk, 2),
                    "speedup_vs_w8a8_exact": round(t_w8 / t_pk, 3),
                    **mfu_fields(g_p, t_pk / B, peak, int8_peak=True),
                }
                del imgP, gripP
                # B=48: the accel stack cuts per-action compute ~3x, so
                # the per-dispatch fixed cost amortizes better past B=32
                # (scripts/bench_peak_batch.py sweep: 591 @32 -> 624 @48
                # -> 620 @64).  Same program retraced at the bigger
                # batch; driver-records the one-chip peak at its true
                # operating point.
                if (os.environ.get("DEER_BENCH_PEAK48", "1") != "0"
                        and not over_budget(240)):
                    try:
                        B48 = 48
                        ids48 = np.full((B48, s), 11, np.int32)
                        ids48[:, 0] = cfg.media_token_id
                        ids48 = jnp.asarray(ids48)
                        mask48 = jnp.ones((B48, s), jnp.int32)
                        grip48 = jnp.asarray(
                            r.randn(B48, 1, 1, 3, 84, 84), jnp.float32)
                        img48 = [jnp.asarray(
                            r.randn(B48, 1, 1, 3, hw, hw), jnp.float32)
                            for _ in range(iters_w + warm_w)]
                        c48 = zero_carry(cfg.head.lstm_num_layers, B48,
                                         cfg.head.hidden_size,
                                         jnp.float32)
                        th48 = full_thresholds(len(exits) - 1)
                        for i in range(warm_w):
                            a_, g_, c48, e_ = pk._step(
                                pk.params, pk.stacked, img48[i], grip48,
                                ids48, mask48, c48, th48)
                        jax.block_until_ready((a_, g_, c48, e_))
                        t0 = time.perf_counter()
                        for i in range(warm_w, warm_w + iters_w):
                            a_, g_, c48, e_ = pk._step(
                                pk.params, pk.stacked, img48[i], grip48,
                                ids48, mask48, c48, th48)
                        jax.block_until_ready((a_, g_, c48, e_))
                        t_48 = (time.perf_counter() - t0) / iters_w
                        batched_w8a8["stacked_peak_tome8_grip84"]["b48"] = {
                            "actions_per_sec": round(B48 / t_48, 2),
                            "speedup_vs_b32": round(
                                (B48 / t_48) / (B / t_pk), 3),
                            **mfu_fields(g_p, t_48 / B48, peak,
                                         int8_peak=True),
                        }
                        del img48, grip48, c48, a_, g_, e_
                    except Exception as e:
                        batched_w8a8["stacked_peak_tome8_grip84"][
                            "b48"] = {"error": repr(e)[:200]}
                elif os.environ.get("DEER_BENCH_PEAK48", "1") != "0":
                    batched_w8a8["stacked_peak_tome8_grip84"]["b48"] = {
                        "skipped": "time budget"}
                del pk
            except Exception as e:
                batched_w8a8["stacked_peak_tome8_grip84"] = {
                    "error": repr(e)[:200]}
            section_done()
        elif os.environ.get("DEER_BENCH_PEAK", "1") != "0":
            # w8 is None (w8a8 env-disabled, budget-skipped, or errored):
            # the peak subsection still records an explicit marker so
            # 'every optional section marks itself' holds unconditionally
            batched_w8a8["stacked_peak_tome8_grip84"] = {
                "skipped": "w8a8 unavailable"}
            if "batched32_w8a8" not in detail:
                detail["batched32_w8a8"] = batched_w8a8
            section_done()

        # mixed-precision MFU decomposition (VERDICT r4 item 5): WHERE does
        # the batched-w8a8 step's time go?  Same-process carry-chained A/B
        # of four precision splits — bf16 everything / w8a8 everything
        # (today's mode: the vision tower IS quantized, ops/quant.py
        # SERVING_QUANT_PARTS) / int8 decoder under bf16 vision / int8
        # vision under bf16 decoder — each scored with per-component
        # per-precision floors (mixed_mfu_fields).  Outcome: either a
        # measured win from a different split, or the honest accounting
        # that explains the 0.30-of-int8-peak reading.
        if (w8 is not None
                and os.environ.get("DEER_BENCH_W8A8_DECOMP", "1") != "0"):
            if over_budget(300):
                batched_w8a8["decomposition"] = {"skipped": "time budget"}
            else:
                try:
                    from deer_vla_tpu.ops.quant import (
                        quantize_serving_stacked as _qss)
                    dec_only = SimpleNamespace(
                        params=bp.params,
                        stacked=_qss(bp.stacked, "int8_w8a8",
                                     parts="decoder"),
                        _step=bp._step)
                    vis_only = SimpleNamespace(
                        params=bp.params,
                        stacked=_qss(bp.stacked, "int8_w8a8",
                                     parts="vision"),
                        _step=bp._step)
                    variants = [("bf16", bp, {"vision": "bf16",
                                              "decoder": "bf16",
                                              "head": "bf16"}),
                                ("w8a8_full", w8, {"vision": "int8",
                                                   "decoder": "int8",
                                                   "head": "bf16"}),
                                ("w8a8_decoder_only", dec_only,
                                 {"vision": "bf16", "decoder": "int8",
                                  "head": "bf16"}),
                                ("w8a8_vision_only", vis_only,
                                 {"vision": "int8", "decoder": "bf16",
                                  "head": "bf16"})]
                    configs = {}
                    for name, eng, prec in variants:
                        poolD = [jnp.asarray(
                            r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
                            for _ in range(iters_w + warm_w)]
                        t = time_b(eng, poolD)
                        configs[name] = {
                            "actions_per_sec": round(B / t, 2),
                            "ms_per_action": round(1000 * t / B, 3),
                            **mixed_mfu_fields(cfg, exits[-1], t / B,
                                               peak, prec)}
                        del poolD
                    base = configs["bf16"]["actions_per_sec"]
                    for name in configs:
                        configs[name]["speedup_vs_bf16"] = round(
                            configs[name]["actions_per_sec"] / base, 3)
                    batched_w8a8["decomposition"] = {
                        "gflops_split":
                            configs["bf16"].pop("gflops_split"),
                        "configs": {n: {k: v for k, v in c.items()
                                        if k != "gflops_split"}
                                    for n, c in configs.items()},
                    }
                except Exception as e:
                    batched_w8a8["decomposition"] = {"error": repr(e)[:200]}
                # `variants`/loop vars reference every engine tree — if they
                # linger, the downstream del w8/del bp free NOTHING and the
                # int8 + calibration sections OOM at 3B (first hardware
                # validation hit RESOURCE_EXHAUSTED exactly there).  None-
                # assign (not del: names may be unbound on the error path).
                dec_only = vis_only = variants = eng = prec = None  # noqa
            section_done()
        if w8 is not None:
            del w8
        # free the batched engine's stacked tree before the int8 engine
        # stacks its own (HBM headroom, see sync_step note above)
        del bp

    # 9B capacity story (VERDICT r3 item 6): per-quant-mode full-depth
    # throughput + resident stacked-weight MB on one chip.  The verdict from
    # scripts/bench_9b_int4.py (int4 is a CAPACITY mode, not a throughput
    # win: 0.93-0.94x w8a8) gets driver-recorded here.  Each mode quantizes
    # the live policy's packed tree (one retrace, no second stacking pass)
    # and re-times bf16 adjacent to it (time-shared chip).
    # (also runs on the tiny model so the whole section is CPU-tested by
    # tests/test_bench_emit.py before it ever executes at 9B on hardware)
    if BENCH_MODEL in ("mpt_9b", "tiny") and os.environ.get(
            "DEER_BENCH_9B_MODES", "1") != "0":
        from types import SimpleNamespace

        from deer_vla_tpu.ops.quant import quantize_serving_stacked
        modes = {"bf16": {
            "full_depth_actions_per_sec": round(aps_full, 2),
            "resident_weights_mb": tree_mb(policy.stacked)}}
        detail["modes"] = modes
        q_w8a8_stacked = None
        # int4 first: the int8 tree is RETAINED for the B=32 run below, so
        # quantizing it last keeps the int4 A/B from coexisting with it
        # (at 9B: bf16 6.4 + int8 3.2 + int4 1.6 GB would crowd the chip
        # that already OOMed once on quantization temps)
        for mode in ("int4_w8a8", "int8_w8a8"):
            if over_budget(300):
                modes[mode] = {"skipped": "time budget"}
                continue
            try:
                q = SimpleNamespace(
                    params=policy.params,
                    stacked=quantize_serving_stacked(policy.stacked, mode),
                    _step=policy._step)
                t_fp = time_depth(len(exits) - 1)
                t_q = time_depth(len(exits) - 1, p=q)
                modes[mode] = {
                    "full_depth_actions_per_sec": round(1.0 / t_q, 2),
                    "bf16_adjacent_actions_per_sec": round(1.0 / t_fp, 2),
                    "speedup_vs_bf16": round(t_fp / t_q, 3),
                    "resident_weights_mb": tree_mb(q.stacked),
                }
                if mode == "int8_w8a8":
                    q_w8a8_stacked = q.stacked  # kept for the batched run
                del q
            except Exception as e:
                modes[mode] = {"error": repr(e)[:200]}
            section_done()

        # batched-32 9B serving on ONE chip — impossible in bf16 (the
        # 6.4 GB stacked tree + B=32 temps exceed HBM; scripts/
        # bench_9b_int4.py) and UNLOCKED by the quantized tree: free the
        # bf16 stacked tree + its programs, then run B=32 full depth on
        # the w8a8 stack.  The capacity story's payoff, driver-recorded.
        if (q_w8a8_stacked is not None
                and os.environ.get("DEER_BENCH_9B_B32", "1") != "0"
                and over_budget(300)):
            # sibling key: the numeric slot holds a float when measured, so
            # the skip marker must not overload it with a dict (ADVICE r4)
            modes["int8_w8a8"]["batched32_skipped"] = "time budget"
            section_done()
        elif (q_w8a8_stacked is not None
                and os.environ.get("DEER_BENCH_9B_B32", "1") != "0"):
            try:
                from deer_vla_tpu.eval.scan_policy import build_scan_step
                from deer_vla_tpu.ops.lstm import zero_carry as zc
                p_small = policy.params
                if BENCH_MODEL == "mpt_9b":
                    del policy  # frees the bf16 stacked tree + programs
                    jax.clear_caches()
                step_b32 = build_scan_step(cfg, exits, "L2", None)[0]
                B9 = 32
                ids9 = np.full((B9, s), 11, np.int32)
                ids9[:, 0] = cfg.media_token_id
                ids9 = jnp.asarray(ids9)
                mask9 = jnp.ones((B9, s), jnp.int32)
                th9 = full_thresholds(len(exits) - 1)
                c9 = zc(cfg.head.lstm_num_layers, B9, cfg.head.hidden_size,
                        jnp.float32)
                it9, wm9 = 10, 3
                pool9 = [jnp.asarray(r.randn(B9, 1, 1, 3, hw, hw),
                                     jnp.float32)
                         for _ in range(it9 + wm9)]
                for i in range(wm9):
                    a9, g9, c9, e9 = step_b32(p_small, q_w8a8_stacked,
                                              pool9[i], pool9[i], ids9,
                                              mask9, c9, th9)
                jax.block_until_ready((a9, g9, c9, e9))
                t0 = time.perf_counter()
                for i in range(wm9, wm9 + it9):
                    a9, g9, c9, e9 = step_b32(p_small, q_w8a8_stacked,
                                              pool9[i], pool9[i], ids9,
                                              mask9, c9, th9)
                jax.block_until_ready((a9, g9, c9, e9))
                aps9 = B9 * it9 / (time.perf_counter() - t0)
                modes["int8_w8a8"][
                    "batched32_full_depth_actions_per_sec"] = round(aps9, 2)
                del pool9, c9, a9, g9, e9, step_b32
                section_done()

                # 9B STACKED peak on the same w8a8 tree: tome8 + grip84
                # (weight-free accels) — measured 607 a/s dynamic / 530
                # full-depth vs 283/265 exact (scripts/bench_9b_int4.py
                # --stack); at batch the shared vision tower dominates, so
                # the 4x bigger decoder nearly matches the 3B peak.  One
                # extra compile; driver-records the 9B headline.
                if (os.environ.get("DEER_BENCH_PEAK", "1") != "0"
                        and not over_budget(240)
                        and 84 % cfg.vit.patch_size == 0):
                    try:  # own scope: a peak flake must not erase aps9
                        import dataclasses as _dc
                        cfg_p9 = _dc.replace(
                            cfg, gripper_res=84,
                            vit=_dc.replace(cfg.vit, tome_r=8))
                        step_p9 = build_scan_step(cfg_p9, exits, "L2",
                                                  None)[0]
                        grip9 = jnp.asarray(
                            r.randn(B9, 1, 1, 3, 84, 84), jnp.float32)
                        c9 = zc(cfg.head.lstm_num_layers, B9,
                                cfg.head.hidden_size, jnp.float32)
                        pool9 = [jnp.asarray(
                            r.randn(B9, 1, 1, 3, hw, hw), jnp.float32)
                            for _ in range(it9 + wm9)]
                        for i in range(wm9):
                            a9, g9, c9, e9 = step_p9(
                                p_small, q_w8a8_stacked, pool9[i], grip9,
                                ids9, mask9, c9, th9)
                        jax.block_until_ready((a9, g9, c9, e9))
                        t0 = time.perf_counter()
                        for i in range(wm9, wm9 + it9):
                            a9, g9, c9, e9 = step_p9(
                                p_small, q_w8a8_stacked, pool9[i], grip9,
                                ids9, mask9, c9, th9)
                        jax.block_until_ready((a9, g9, c9, e9))
                        aps_p9 = B9 * it9 / (time.perf_counter() - t0)
                        modes["int8_w8a8"]["stacked_peak_tome8_grip84"] = {
                            "batched32_full_depth_actions_per_sec":
                                round(aps_p9, 2),
                            "speedup_vs_exact": round(aps_p9 / aps9, 3),
                        }
                        del pool9, grip9, c9, a9, g9, e9, step_p9
                    except Exception as e:
                        modes["int8_w8a8"]["stacked_peak_tome8_grip84"] = \
                            {"error": repr(e)[:200]}
                elif os.environ.get("DEER_BENCH_PEAK", "1") != "0":
                    modes["int8_w8a8"]["stacked_peak_tome8_grip84"] = {
                        "skipped": "time budget"
                        if 84 % cfg.vit.patch_size == 0 else "patch size"}
            except Exception as e:
                modes.setdefault("int8_w8a8", {})["batched32_error"] = \
                    repr(e)[:200]
            section_done()

    # weight-only int8 serving (--quantize int8, ops/quant.py): same engine,
    # int8 decoder/encoder stacks.  One extra compile; the per-depth sweep
    # reuses the program with runtime thresholds.  Same-process ratio vs the
    # bf16 curve above (measured 1.10-1.19x, action drift <= 1e-4 at 3B).
    # On 9B the modes section above already carries the quant story —
    # skipping the weight-only sweep saves its two compiles + 12-point A/B.
    int8_detail = {}
    if BENCH_MODEL == "mpt_9b":
        int8_detail = {"skipped": "9B quant story lives in detail.modes"
                       if "modes" in detail else
                       "9B weight-only sweep off (and DEER_BENCH_9B_MODES "
                       "disabled, so no quant data this run)"}
    elif os.environ.get("DEER_BENCH_INT8", "1") != "0" and over_budget(240):
        int8_detail = {"skipped": "time budget"}
    elif os.environ.get("DEER_BENCH_INT8", "1") != "0":
        try:
            from types import SimpleNamespace

            from deer_vla_tpu.ops.quant import quantize_serving_stacked

            # quantize the LIVE policy's packed tree and reuse its jitted
            # step (it retraces for the int8 layout) — no second stacking
            # pass, so this fits the 9B config's HBM headroom too
            q8 = SimpleNamespace(
                params=policy.params,
                stacked=quantize_serving_stacked(policy.stacked, "int8"),
                _step=policy._step)
            # interleaved A/B per depth: the chip is time-shared, so the
            # bf16 reference is RE-timed adjacent to each int8 point
            # instead of reusing the minutes-old curve above (a concurrent
            # host load once turned a 1.19x win into a bogus 0.7x)
            per_depth_q8, per_depth_fp2 = [], []
            for k in range(len(exits)):
                per_depth_fp2.append(time_depth(k))
                per_depth_q8.append(time_depth(k, p=q8))
            per_depth_q8 = np.array(per_depth_q8)
            per_depth_fp2 = np.array(per_depth_fp2)
            aps_q8 = 1.0 / float((probs * per_depth_q8).sum())
            int8_detail = {
                "actions_per_sec": round(aps_q8, 2),
                "full_depth_actions_per_sec":
                    round(1.0 / per_depth_q8[-1], 2),
                "speedup_vs_bf16": round(
                    float((probs * per_depth_fp2).sum())
                    / float((probs * per_depth_q8).sum()), 3),
                "per_depth_ms": [round(1000 * t, 2) for t in per_depth_q8],
                "bf16_adjacent_per_depth_ms":
                    [round(1000 * t, 2) for t in per_depth_fp2],
                # weight-only int8 still computes in bf16 -> bf16 peak basis
                **mfu_fields(expected_gflops, 1.0 / aps_q8, peak),
            }
            # fp-vs-int8 exit-choice agreement under calibrated thresholds
            # (VERDICT r2 item 7) — needs the raw param tree (freed on 9B)
            if (BENCH_MODEL != "mpt_9b"
                    and os.environ.get("DEER_BENCH_INT8_AGREE", "1") != "0"):
                if over_budget(300):  # 2 x 128 honest-sync dispatches now
                    int8_detail["exit_agreement"] = {"skipped": "time budget"}
                else:
                    try:
                        int8_detail["exit_agreement"] = run_int8_agreement(
                            policy, q8, params, cfg)
                    except Exception as e:
                        int8_detail["exit_agreement"] = {
                            "error": repr(e)[:200]}
            del q8
        except Exception as e:
            int8_detail = {"error": repr(e)[:200]}
    if int8_detail:
        detail["int8"] = int8_detail
        section_done()

    # folded vs streamed calibration at the bench model's scale on the chip
    # (VERDICT r4 item 3) — needs the raw param tree (freed on 9B).  Runs
    # LAST: it opens the x-attn gates in the live trees (bench-final).
    calib_detail = {}
    if BENCH_MODEL == "mpt_9b":
        pass  # params freed for HBM headroom; 3B carries the comparison
    elif os.environ.get("DEER_BENCH_CALIB", "1") != "0" and over_budget(360):
        calib_detail = {"skipped": "time budget"}
    elif os.environ.get("DEER_BENCH_CALIB", "1") != "0":
        try:
            calib_detail = run_calibration_bench(policy, params, cfg)
        except Exception as e:
            calib_detail = {"error": repr(e)[:200]}
    if calib_detail:
        detail["calibration"] = calib_detail
        section_done()
    return result


def _open_xattn_gates(params, trees, cfg, seed: int):
    """A random-init model has ZERO x-attn gates (helpers.py:255-258
    parity), so exit deltas depend on text alone and any threshold is
    degenerate; open them with shared random values IDENTICALLY in the raw
    params (calibration pass) and every engine's stacked tree (the
    tests/test_exit_contract.py trick).  Gates are (n_x, 1) scalars — no
    HBM cost, no recompile.  Mutates in place."""
    n_x = trees[0]["xattn"]["attn_gate"].shape[0]
    kg = jax.random.PRNGKey(seed)
    ag = jax.random.normal(jax.random.fold_in(kg, 0), (n_x, 1)) * 0.5
    fg = jax.random.normal(jax.random.fold_in(kg, 1), (n_x, 1)) * 0.5
    xi = 0
    for x in params["decoder"]["xattn"]:
        if x is None:
            continue
        x["attn_gate"], x["ff_gate"] = ag[xi], fg[xi]
        xi += 1
    assert xi == n_x, (xi, n_x)
    for tree in trees:
        tree["xattn"]["attn_gate"] = ag
        tree["xattn"]["ff_gate"] = fg


def _debug_batches(cfg, tok, seed_, num, bs=4):
    """Synthetic CALVIN-shaped batches; ids remapped to the engines'
    compiled media token (the tokenizer/model contract)."""
    from deer_vla_tpu.data.debug_data import DebugBatcher

    def remap(ids):
        ids = np.asarray(ids).copy()
        if tok.media_token_id != cfg.media_token_id:
            ids[ids == tok.media_token_id] = cfg.media_token_id
        return ids

    for b in DebugBatcher(cfg, tok, batch_size=bs, num_batches=num,
                          img_hw=cfg.vit.image_size,
                          grip_hw=cfg.vit.image_size, seed=seed_):
        yield {**b, "input_ids": remap(b["input_ids"])}


def _stream_probe(cfg, tok, seed, T, n_streams):
    """Held-out probe: n_streams parallel episodes (distinct goals) x T
    timesteps of distinct frames.  Returns (frames, ids_B, mask_B) where
    frames[t] = (img_B, grip_B)."""
    from deer_vla_tpu.data.preprocess import clip_preprocess
    prep = jax.jit(functools.partial(clip_preprocess,
                                     size=cfg.vit.image_size))
    frames, ids_B, mask_B = [], None, None
    for b in _debug_batches(cfg, tok, seed,
                            (T + cfg.window_size - 1) // cfg.window_size,
                            bs=n_streams):
        s = b["input_ids"].shape[-1]
        if ids_B is None:  # goals constant over each stream's episode
            ids_B = jnp.asarray(b["input_ids"].reshape(n_streams, s))
            mask_B = jnp.ones((n_streams, s), jnp.int32)
        for t in range(b["rgb_static"].shape[1]):
            img = prep(jnp.asarray(b["rgb_static"][:, t]))[:, None, None]
            grp = prep(jnp.asarray(b["rgb_gripper"][:, t]))[:, None, None]
            frames.append((img, grp))
            if len(frames) >= T:
                break
        if len(frames) >= T:
            break
    return frames, ids_B, mask_B


def _run_streams(engine, cfg, frames, ids_B, mask_B, th_row,
                 n_streams) -> np.ndarray:
    """Thread per-stream carries across the probe; (T * n_streams,) exits."""
    from deer_vla_tpu.ops.lstm import zero_carry
    carry = zero_carry(cfg.head.lstm_num_layers, n_streams,
                       cfg.head.hidden_size, jnp.float32)
    taken = []
    for img, grp in frames:
        _, _, carry, el = engine._step(engine.params, engine.stacked,
                                       img, grp, ids_B, mask_B, carry,
                                       th_row)
        taken.append(np.asarray(el))  # host readback: honest sync
    return np.concatenate(taken)


def run_int8_agreement(policy, q8, params, cfg, steps: int = 128,
                       exit_ratio: float = 0.8, seed: int = 123,
                       n_streams: int = 8) -> dict:
    """Trajectory-level exit-CHOICE agreement, fp vs int8, under CALIBRATED
    thresholds (VERDICT r2 item 7) — the quantity that actually moves the
    GFLOPs/success trade-off, which action-drift bounds don't capture.

    De-degenerated per VERDICT r4 item 2 (BENCH_r04's probe realized
    fp_exit_hist = [0,24,0,0,0,0] — agreement=1.0 certified nothing):

      * thresholds are calibrated from the probe distribution's own deltas
        in the SERVING regime (streamed calibration, carry threaded +
        target-sampled commits — the CPU contract tests' method) so the
        realized exits spread toward the target mix by construction;
      * the probe is ``n_streams`` parallel episodes (distinct goals,
        distinct per-step frames) x steps/n_streams timesteps — >= 128
        exit decisions with genuine input variation, not one 24-step
        stream that settles into a single bin;
      * agreement is reported ONLY when the realized fp histogram occupies
        >= min(3, n_exits) bins; a degenerate probe retries with a uniform
        target mix (exit_ratio 1.0), then with PER-STREAM threshold
        scaling (log-spaced 2^-2..2^2 rows — forces streams across
        different depths even when a warmed random-init carry makes
        deltas a near-point-mass, the measured 3B reality), and only then
        returns an explicit ``degenerate`` marker with the histogram
        instead of a trivially perfect agreement number.

    Gates are opened identically in all three trees (see _open_xattn_gates);
    mutates the passed trees (bench-final use).
    """
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.calibrate import generate_calibration_values
    from deer_vla_tpu.models.value_net import exit_probs as _exit_probs
    from deer_vla_tpu.models.value_net import solve_thresholds

    exits = list(policy.exits)
    _open_xattn_gates(params, (policy.stacked, q8.stacked), cfg, seed)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)

    # serving-regime calibration (streamed; falls back to folded for
    # window-folded models where no stream exists to match)
    can_stream = cfg.fusion_mode != "vit_concat" and cfg.window_size >= 2 \
        and not cfg.use_hist

    def calibrate(ratio):
        target = _exit_probs(len(exits), ratio, "exp")
        if can_stream:
            return generate_calibration_values(
                params, cfg, _debug_batches(cfg, tok, seed, 3),
                streamed=True, exit_sample_probs=list(target))
        return generate_calibration_values(params, cfg,
                                           _debug_batches(cfg, tok, seed, 3))

    values = calibrate(exit_ratio)
    if len(np.unique(values[0])) < max(4, len(exits)):
        return {"error": "degenerate calibration deltas (gates)"}

    # probe: n_streams parallel episodes x T steps, one batched dispatch
    # per timestep (per-stream exits in one while_loop program)
    T = max(1, steps // n_streams)
    frames, ids_B, mask_B = _stream_probe(cfg, tok, seed + 1000, T,
                                          n_streams)

    min_bins = min(3, len(exits))
    used_ratio = exit_ratio
    spread = None
    for attempt in ("target", "uniform", "scaled"):
        if attempt == "uniform":
            # degenerate realized mix: retry at the uniform target
            # (max spread => max near-threshold power)
            used_ratio = 1.0
            values = calibrate(used_ratio)
        th_map, probs_solved = solve_thresholds(values, used_ratio, exits,
                                                exits[-1])
        row = np.asarray(policy.threshold_row(th_map), np.float32)
        if attempt == "scaled":
            # last resort (3B hardware reality: a RANDOM-INIT model's
            # deltas become input-insensitive once the LSTM carry warms,
            # so no single threshold row can split the near-point-mass —
            # first validation realized [0,16,112,0,0,0], the 16 being
            # exactly the fresh-carry decisions).  Per-stream threshold
            # scaling (log-spaced 2^-2..2^2; the engines' (B, n_layers)
            # runtime-row layout) forces different streams across
            # different depths, so agreement is measured at MANY
            # near-threshold operating points — fp and int8 still compare
            # under IDENTICAL rows.
            scales = np.logspace(-2, 2, n_streams,
                                 base=2.0).astype(np.float32)
            th_row = jnp.asarray(row[None, :] * scales[:, None])
            spread = {"per_stream_scales":
                      [round(float(s), 3) for s in scales]}
        else:
            th_row = jnp.asarray(row)
        fp_e = _run_streams(policy, cfg, frames, ids_B, mask_B, th_row,
                            n_streams)
        hist = [int((fp_e == e).sum()) for e in exits]
        if sum(1 for c in hist if c) >= min_bins:
            break
    else:
        return {"degenerate": True, "fp_exit_hist": hist,
                "steps": int(fp_e.size), "exit_ratio": used_ratio,
                "calibration": "streamed" if can_stream else "folded"}
    q8_e = _run_streams(q8, cfg, frames, ids_B, mask_B, th_row, n_streams)
    out = {
        "steps": int(fp_e.size),
        "exit_agreement": round(float((fp_e == q8_e).mean()), 4),
        "mean_abs_exit_gap_layers":
            round(float(np.abs(fp_e - q8_e).mean()), 3),
        "fp_exit_hist": hist,
        "occupied_bins": int(sum(1 for c in hist if c)),
        "n_streams": n_streams,
        "exit_ratio": used_ratio,
        "calibration": "streamed" if can_stream else "folded",
        "target_probs": [round(float(p), 3) for p in probs_solved],
    }
    if spread is not None:
        out["spread"] = spread
    return out


def run_calibration_bench(policy, params, cfg, steps: int = 128,
                          exit_ratio: float = 0.8, seed: int = 321,
                          n_streams: int = 8) -> dict:
    """Folded vs streamed calibration, scored by what serving realizes
    (VERDICT r4 item 3): calibrate BOTH regimes on the same synthetic
    stream set, serve the same held-out streams through the production
    while-loop engine with each regime's thresholds, and report each
    realized exit mix's total-variation distance to the solver target.

    Until now the --calib_streamed payoff (2.5x tighter TV) rested on
    tiny-scale CPU contract tests (tests/test_exit_contract.py:391-455);
    this section driver-records the same quantity at the bench model's
    scale on the chip.  Reference regime it corrects: value_net.py:140-151
    (random-prior decorrelated calibration vs carry-threaded serving).

    Mutates the passed trees via _open_xattn_gates (run bench-final)."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.calibrate import generate_calibration_values
    from deer_vla_tpu.models.value_net import exit_probs as _exit_probs
    from deer_vla_tpu.models.value_net import solve_thresholds

    exits = list(policy.exits)
    if (cfg.fusion_mode == "vit_concat" or cfg.window_size < 2
            or cfg.use_hist):
        return {"skipped": "no streamed regime for window-folded models"}
    _open_xattn_gates(params, (policy.stacked,), cfg, seed)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    target = _exit_probs(len(exits), exit_ratio, "exp")

    cal_folded = generate_calibration_values(
        params, cfg, _debug_batches(cfg, tok, seed, 3))
    cal_streamed = generate_calibration_values(
        params, cfg, _debug_batches(cfg, tok, seed, 3),
        streamed=True, exit_sample_probs=list(target))
    if len(np.unique(cal_folded[0])) < max(4, len(exits)):
        return {"error": "degenerate calibration deltas (gates)"}

    T = max(1, steps // n_streams)
    frames, ids_B, mask_B = _stream_probe(cfg, tok, seed + 1000, T,
                                          n_streams)

    def realized_tv(values):
        th_map, probs = solve_thresholds(values, exit_ratio, exits,
                                         exits[-1])
        th_row = jnp.asarray(policy.threshold_row(th_map))
        els = _run_streams(policy, cfg, frames, ids_B, mask_B, th_row,
                           n_streams)
        hist = np.array([(els == e).sum() for e in exits], np.float64)
        hist /= max(1.0, hist.sum())
        tv = 0.5 * float(np.abs(hist - probs).sum())
        return tv, [round(float(h), 4) for h in hist]

    folded_tv, folded_hist = realized_tv(cal_folded)
    streamed_tv, streamed_hist = realized_tv(cal_streamed)
    out = {
        "folded_tv": round(folded_tv, 4),
        "streamed_tv": round(streamed_tv, 4),
        "tv_ratio": round(folded_tv / max(streamed_tv, 1e-6), 3),
        "folded_hist": folded_hist,
        "streamed_hist": streamed_hist,
        "target_probs": [round(float(p), 4) for p in target],
        "exit_ratio": exit_ratio,
        "n_streams": n_streams, "steps": T * n_streams,
    }
    # honesty annotation (first 3B hardware validation): with RANDOM
    # weights at scale, deltas become input-insensitive once the carry
    # warms — the realized mix collapses to 1-2 bins under EITHER regime
    # and the TV comparison stops discriminating them.  Flag it so the
    # artifact can't be read as a verdict on --calib_streamed; the
    # regime comparison is meaningful on trained weights (and at tiny
    # scale, where the contract tests measure the 2.5x win).
    bins = [sum(1 for h in hist if h > 1e-9)
            for hist in (folded_hist, streamed_hist)]
    if min(bins) < min(3, len(exits)):
        out["serving_mix_degenerate"] = True
        out["note"] = ("random-init deltas are input-insensitive at this "
                       "scale once the carry warms; TVs do not "
                       "discriminate calibration regimes here — compare "
                       "on trained weights")
    return out


def _bench_train_cfg():
    """3B joint-phase config for the train benches.  B=6/W=12 activations
    at 3B don't fit 16GB without remat — same trade the --remat train flag
    makes (jax.checkpoint per layer)."""
    import dataclasses

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    cfg = MODEL_REGISTRY["mpt_dolly_3b"](max_layer=12)
    return dataclasses.replace(cfg, remat_layers=True)


def _make_train_state(cfg):
    """Init the joint-phase train step + state (frozen leaves in bf16)."""
    from deer_vla_tpu.models.flamingo import (cast_frozen_to_bf16, init_deer,
                                              trainable_mask)
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import init_train_state, make_train_step

    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    mask = trainable_mask(params, cfg, "joint")
    params = jax.jit(lambda p: cast_frozen_to_bf16(p, mask))(params)
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-4,
                         warmup_steps=0, total_steps=1000, trainable=mask)
    step = make_train_step(cfg, opt, phase="joint")
    state = init_train_state(params, opt)
    del params
    jax.block_until_ready(state)
    return step, state


def run_train_bench(batch_size: int = 6, iters: int = 8, warmup: int = 2) -> dict:
    """3B joint-phase train-step throughput on one chip (the reference's
    per-GPU training unit: batch_size_calvin=6, window 12 — the canonical
    train script's per-device load).  Device-pipelined like time_depth: the
    TrainState threads step-to-step on device, every step gets DISTINCT
    images (runtime dedupe protection), one sync at the end."""
    cfg = _bench_train_cfg()
    step, state = _make_train_state(cfg)

    hw, s, w = cfg.vit.image_size, cfg.text_len, cfg.window_size
    r = np.random.RandomState(0)
    ids = np.full((batch_size * w, s), 11, np.int32)
    ids[:, 0] = cfg.media_token_id
    base = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((batch_size * w, s), jnp.int32),
        "gripper": jnp.asarray(r.randn(batch_size * w, 1, 1, 3, hw, hw),
                               jnp.float32),
        "labels": jnp.asarray(
            np.clip(r.randn(batch_size, w, 7) * 0.3, -1, 1), jnp.float32),
    }
    imgs = [jnp.asarray(r.randn(batch_size * w, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(iters + warmup)]
    rng = jax.random.PRNGKey(1)
    for i in range(warmup):
        state, metrics = step(state, dict(base, image=imgs[i]),
                              jax.random.fold_in(rng, i))
    jax.block_until_ready((state, metrics))
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        state, metrics = step(state, dict(base, image=imgs[i]),
                              jax.random.fold_in(rng, i))
    jax.block_until_ready((state, metrics))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(float(metrics["loss"]))
    from deer_vla_tpu.eval.flops import train_step_flops
    return {"samples_per_sec": round(batch_size / dt, 2),
            "step_ms": round(1000 * dt, 1),
            "batch_size": batch_size, "window": w,
            # 3x-forward convention, remat recompute uncounted (flops.py)
            **mfu_fields(train_step_flops(cfg), dt / batch_size,
                         peak_tflops())}


def run_pipeline_bench(batch_size: int = 6, iters: int = 8,
                       warmup: int = 2, cfg=None) -> dict:
    """3B train step fed by the REAL input pipeline (VERDICT r2 item 5):
    synthetic CALVIN shards at real frame sizes (200x200 static / 84x84
    gripper uint8 npz) on disk -> DiskCalvinDataset window assembly through
    the native C++ reader -> CalvinLoader background prefetch -> on-device
    clip-preprocess + RandomShiftsAug (prepare_batch) -> train step.

    Reports the numbers that decide whether the loader can keep the chip
    fed (the reference's persistent-worker/prefetch-3 loader concern,
    robot_flamingo/data/data.py:1064-1130): host-only loader rate,
    loader-idle wait per step, and an adjacent same-process A/B of
    overlapped (async dispatch, fetch during device compute) vs serialized
    (block on the step before fetching) epochs."""
    import dataclasses
    import tempfile

    from deer_vla_tpu.data import native_loader
    from deer_vla_tpu.data.calvin import (CalvinDataConfig, CalvinLoader,
                                          DiskCalvinDataset)
    from deer_vla_tpu.data.debug_data import make_synthetic_calvin
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.train.trainer import TrainConfig, prepare_batch

    cfg = cfg or _bench_train_cfg()
    # tokenizer/model contract: HashTokenizer at the model vocab, cfg
    # re-pointed at its media token (what cli.train.make_tokenizer does)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    tcfg = TrainConfig()  # reference aug defaults: rgb_pad 10, gripper_pad 4

    tmp = tempfile.TemporaryDirectory(prefix="deer_pipe_")
    split = make_synthetic_calvin(tmp.name, n_episodes=3, ep_len=40,
                                  img_hw=200, grip_hw=84)
    ds = DiskCalvinDataset(
        CalvinDataConfig(dataset_dir=split, window_size=cfg.window_size),
        validation=False)
    loader = CalvinLoader(ds, tok, batch_size, workers=4, prefetch=3, seed=0)
    assert len(loader) >= warmup + iters, (len(loader), warmup + iters)

    # host-only loader rate: disk -> native reader -> collate, no device
    t0 = time.perf_counter()
    nb = 0
    for _ in loader:
        nb += 1
        if nb >= 12:
            break
    loader_only_bps = nb / (time.perf_counter() - t0)

    step, state = _make_train_state(cfg)
    rng = jax.random.PRNGKey(2)

    def timed_epoch(epoch, overlap):
        """One measured epoch; returns (step_s, loader_wait_s) per step.
        Distinct epoch => distinct shuffle + distinct aug rng folds, so no
        two dispatches ever see identical argument buffers (runtime dedupe
        protection); the TrainState threads through on device."""
        nonlocal state
        loader.set_epoch(epoch)
        it = iter(loader)
        wait_s, t_start, metrics = 0.0, 0.0, None
        for i in range(warmup + iters):
            if i == warmup:
                jax.block_until_ready((state, metrics))
                wait_s, t_start = 0.0, time.perf_counter()
            t0 = time.perf_counter()
            raw = next(it)
            wait_s += time.perf_counter() - t0
            batch = prepare_batch(raw, cfg,
                                  jax.random.fold_in(rng, 1000 * epoch + i),
                                  tcfg)
            state, metrics = step(state, batch,
                                  jax.random.fold_in(rng, 7000 + 100 * epoch + i))
            if not overlap:
                jax.block_until_ready(metrics)
        jax.block_until_ready((state, metrics))
        assert np.isfinite(float(metrics["loss"]))
        return (time.perf_counter() - t_start) / iters, wait_s / iters

    # chip-weather robustness (CLAUDE.md: identical compiled programs vary
    # 15-195 ms/step across time windows): interleave the two modes
    # O,S,O,S and take the best epoch per mode — only adjacent same-process
    # comparisons are meaningful on this runtime
    step_overlap, wait_overlap = timed_epoch(0, overlap=True)
    step_serial, wait_serial = timed_epoch(1, overlap=False)
    step_overlap, wait_overlap = min(
        (step_overlap, wait_overlap), timed_epoch(2, overlap=True))
    step_serial, wait_serial = min(
        (step_serial, wait_serial), timed_epoch(3, overlap=False))
    from deer_vla_tpu.eval.flops import train_step_flops
    out = {
        "samples_per_sec": round(batch_size / step_overlap, 2),
        "step_ms": round(1000 * step_overlap, 1),
        "loader_idle_ms_per_step": round(1000 * wait_overlap, 2),
        "serialized_step_ms": round(1000 * step_serial, 1),
        "serialized_loader_wait_ms": round(1000 * wait_serial, 2),
        "overlap_speedup": round(step_serial / step_overlap, 3),
        "loader_only_batches_per_sec": round(loader_only_bps, 2),
        "native_reader": bool(native_loader.available()),
        "batch_size": batch_size, "window": cfg.window_size,
        "frame_hw": [200, 84],
        **mfu_fields(train_step_flops(cfg), step_overlap / batch_size,
                     peak_tflops()),
    }
    tmp.cleanup()
    return out


def wait_for_device(max_wait_s: float) -> bool:
    """The axon tunnel goes down for hours at a time (CLAUDE.md); probe the
    backend in a SUBPROCESS (a hung jax.devices() would otherwise hang this
    process forever) and retry within a bounded window so a transient outage
    doesn't sink the round's bench artifact."""
    import subprocess
    import sys
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                capture_output=True, timeout=150)
            if out.returncode == 0 and out.stdout.strip().isdigit():
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"bench: backend unavailable (probe {attempt}); retrying",
              file=sys.stderr)
        time.sleep(min(120.0, max(5.0, deadline - time.time())))


def _compact_9b(r9: dict) -> dict:
    """The nested 9B run's fields worth carrying in the 3B artifact line."""
    d = r9.get("detail", {})
    out = {
        "actions_per_sec": r9["value"],
        "vs_baseline": r9["vs_baseline"],
        "full_depth_actions_per_sec": d.get("full_depth_actions_per_sec"),
        "per_depth_ms": d.get("per_depth_ms"),
        "dynamic_mfu": d.get("dynamic_mfu", {}),
        "full_depth_mfu": d.get("full_depth_mfu", {}),
    }
    if "modes" in d:
        out["modes"] = d["modes"]
    return out


def main():
    # persistent compile cache (driver-run accelerator): the full path
    # spends ~10+ min compiling ~a dozen programs per fresh process; a
    # warm cache on this host cuts that to seconds on repeat runs.  JAX
    # invalidates by fingerprint (program + flags + backend), so staleness
    # is safe; best-effort because the axon backend may not support it.
    cache_dir = os.environ.get("DEER_BENCH_COMPILE_CACHE",
                               "/tmp/deer_jax_cache_tpu")
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              5.0)
        except Exception as e:
            print(f"bench: compile cache unavailable: {e!r}", flush=True)

    # the backend wait counts against the SAME budget as everything else
    # (VERDICT r3 weak 1): a long outage eats into optional sections, not
    # into the driver's patience; and every section lands incrementally
    # via emit(), so a kill at any point leaves the freshest artifact.
    wait_s = min(float(os.environ.get("DEER_BENCH_WAIT_S", "900")),
                 max(120.0, BUDGET_S - 240.0))
    if not wait_for_device(wait_s):
        # parseable failure line instead of a hang/crash with no artifact
        emit({
            "metric": "actions_per_sec_per_chip", "value": 0.0,
            "unit": "actions/s", "vs_baseline": 0.0,
            "error": f"TPU backend unavailable after {wait_s:.0f}s wait"})
        return
    result = run_model(BENCH_MODEL, emit_cb=emit)
    if BENCH_MODEL == "mpt_dolly_3b" and os.environ.get("DEER_BENCH_TRAIN",
                                                        "1") != "0" \
            and over_budget(360):
        result["detail"]["train_3b"] = {"skipped": "time budget"}
    elif BENCH_MODEL == "mpt_dolly_3b" and os.environ.get("DEER_BENCH_TRAIN",
                                                          "1") != "0":
        # B=6 (the reference per-GPU unit) is ~78MB over this chip's 15.75G
        # HBM even with remat; step down until the program fits
        for tb in (6, 4, 2):
            try:
                result["detail"]["train_3b"] = run_train_bench(batch_size=tb)
                break
            except Exception as e:  # best-effort: never sink the serving line
                result["detail"]["train_3b"] = {"error": repr(e)[:200]}
    if "train_3b" in result["detail"]:
        emit(result)
    # real-loader-fed train step (VERDICT r2 item 5): at the batch size the
    # synthetic train bench fit (or the smallest, if it was skipped)
    pipe_on = (BENCH_MODEL == "mpt_dolly_3b"
               and os.environ.get("DEER_BENCH_PIPELINE", "1") != "0")
    if pipe_on and over_budget(360):
        result["detail"]["train_pipeline"] = {"skipped": "time budget"}
    elif pipe_on:
        tb = result["detail"].get("train_3b", {}).get("batch_size", 2)
        try:
            result["detail"]["train_pipeline"] = run_pipeline_bench(
                batch_size=tb)
        except Exception as e:  # best-effort: never sink the serving line
            result["detail"]["train_pipeline"] = {"error": repr(e)[:200]}
    if pipe_on:
        emit(result)

    # the sharded-config claim needs a number attached (VERDICT r2 item 10):
    # fold a truncated-9B measurement into the same driver artifact line;
    # its sections merge in incrementally via the nested emit callback
    if BENCH_MODEL == "mpt_dolly_3b" and os.environ.get("DEER_BENCH_9B",
                                                        "1") != "0" \
            and over_budget(420):
        result["detail"]["mpt_9b"] = {"skipped": "time budget"}
    elif BENCH_MODEL == "mpt_dolly_3b" and os.environ.get("DEER_BENCH_9B",
                                                          "1") != "0":
        def merge_9b(r9):
            result["detail"]["mpt_9b"] = _compact_9b(r9)
            emit(result)

        try:
            result["detail"]["mpt_9b"] = _compact_9b(
                run_model("mpt_9b", emit_cb=merge_9b))
        except Exception as e:  # 9B is best-effort: never sink the 3B line
            result["detail"].setdefault("mpt_9b", {})["error"] = \
                repr(e)[:200]
    emit(result)


if __name__ == "__main__":
    main()
