"""bench.py incremental-emit contract (VERDICT r3 item 1).

BENCH_r03.json landed as rc=124/parsed=null because bench printed its one
JSON line only at the very end of a ~33 min run.  The restructure under
test here:

  * run_model emits the CORE headline (dynamic + full-depth + per-depth MFU)
    before any optional section starts;
  * every completed section re-emits the enriched line (the driver takes
    the last parseable stdout line, so a mid-run kill only loses the
    in-flight section);
  * emit() mirrors each line to runs/bench_partial.json on disk;
  * a stacked-peak failure can no longer erase the measured w8a8 dict
    (VERDICT r3 item 4 — per-subsection try/except).

Runs the tiny model on CPU; the driver runs the same code at 3B on TPU.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _silence_sections(monkeypatch, keep=()):
    for k in ("TOME", "GRIP", "W8A8", "PEAK", "PEAK48", "INT8", "9B_MODES",
              "CALIB", "W8A8_DECOMP"):
        monkeypatch.setenv(f"DEER_BENCH_{k}", "1" if k in keep else "0")


@pytest.mark.quick
def test_core_headline_emitted_before_sections(monkeypatch):
    import bench
    _silence_sections(monkeypatch, keep=("9B_MODES",))
    emitted = []
    result = bench.run_model(
        "tiny", emit_cb=lambda r: emitted.append(json.loads(json.dumps(r))))
    # at least: core emission, then the batched-32 section emission
    assert len(emitted) >= 2
    core = emitted[0]
    assert core["value"] > 0 and core["unit"] == "actions/s"
    d = core["detail"]
    assert d["full_depth_actions_per_sec"] > 0
    assert len(d["per_depth_ms"]) == len(d["per_depth_gflops_per_action"])
    assert d["dynamic_mfu"]["gflops_per_unit"] > 0
    # batched-32 is NOT part of the first emission (it compiles a second
    # program) — it fills in on a later one
    assert d["batched32_full_depth_actions_per_sec"] == 0.0
    assert emitted[-1]["detail"]["batched32_full_depth_actions_per_sec"] > 0
    assert result["detail"]["batched32_full_depth_actions_per_sec"] > 0
    # the per-quant-mode capacity table (driver-records the 9B story; runs
    # at tiny here so the section is CPU-tested before 9B hardware)
    modes = result["detail"]["modes"]
    assert modes["bf16"]["resident_weights_mb"] > 0
    for m in ("int8_w8a8", "int4_w8a8"):
        assert modes[m]["full_depth_actions_per_sec"] > 0, modes
        assert 0 < modes[m]["resident_weights_mb"] \
            < modes["bf16"]["resident_weights_mb"]
    assert modes["int4_w8a8"]["resident_weights_mb"] \
        < modes["int8_w8a8"]["resident_weights_mb"]
    # the capacity payoff: batched-32 serving on the quantized tree (at 9B
    # this is the config the bf16 tree cannot fit; CPU-tested at tiny)
    assert modes["int8_w8a8"]["batched32_full_depth_actions_per_sec"] > 0


def test_budget_exhaustion_records_explicit_skips(monkeypatch):
    """With the budget already spent, every optional section must record a
    {'skipped': 'time budget'} marker (never silently absent) while the
    core headline + batched-32 measurement still complete — the artifact
    can always distinguish not-attempted from lost-to-a-kill."""
    import bench
    _silence_sections(monkeypatch,
                      keep=("TOME", "GRIP", "W8A8", "INT8", "9B_MODES",
                            "CALIB"))
    monkeypatch.setattr(bench, "BUDGET_S", 0.0)
    result = bench.run_model("tiny", emit_cb=None)
    d = result["detail"]
    assert result["value"] > 0
    assert d["batched32_full_depth_actions_per_sec"] > 0
    for k in ("batched32_tome8", "batched32_grip84", "batched32_w8a8",
              "int8", "calibration"):
        assert d[k] == {"skipped": "time budget"}, (k, d[k])
    for m in ("int8_w8a8", "int4_w8a8"):
        assert d["modes"][m] == {"skipped": "time budget"}


def test_backend_unavailable_emits_parseable_failure(monkeypatch, tmp_path,
                                                     capsys):
    """A dead tunnel must still produce a parseable artifact line (and the
    partial-file mirror) instead of a hang or bare crash."""
    import bench
    monkeypatch.setattr(bench, "PARTIAL_PATH",
                        str(tmp_path / "bench_partial.json"))
    monkeypatch.setattr(bench, "wait_for_device", lambda s: False)
    bench.main()
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith("{")]
    r = json.loads(out_lines[-1])
    assert r["value"] == 0.0 and "unavailable" in r["error"]
    assert json.loads((tmp_path / "bench_partial.json").read_text()) == r


def test_stacked_peak_b48_structure(monkeypatch):
    """The B=48 operating-point measurement rides the stacked-peak
    section: present with throughput + speedup-vs-B32 when enabled."""
    import bench
    _silence_sections(monkeypatch, keep=("W8A8", "PEAK", "PEAK48"))
    result = bench.run_model("tiny", emit_cb=None)
    pk = result["detail"]["batched32_w8a8"]["stacked_peak_tome8_grip84"]
    assert pk["actions_per_sec"] > 0, pk
    b48 = pk["b48"]
    assert "error" not in b48, b48
    assert b48["actions_per_sec"] > 0 and b48["speedup_vs_b32"] > 0


def test_w8a8_decomposition_structure(monkeypatch):
    """batched32_w8a8.decomposition (VERDICT r4 item 5): four precision
    splits measured, each with throughput + speedup-vs-bf16; CPU-tested at
    tiny before the driver records it at 3B."""
    import bench
    _silence_sections(monkeypatch, keep=("W8A8", "W8A8_DECOMP"))
    result = bench.run_model("tiny", emit_cb=None)
    dec = result["detail"]["batched32_w8a8"]["decomposition"]
    assert "error" not in dec, dec
    cf = dec["configs"]
    assert set(cf) == {"bf16", "w8a8_full", "w8a8_decoder_only",
                       "w8a8_vision_only"}, cf
    for c in cf.values():
        assert c["actions_per_sec"] > 0 and c["ms_per_action"] > 0
        assert c["speedup_vs_bf16"] > 0
    assert cf["bf16"]["speedup_vs_bf16"] == 1.0
    g = dec["gflops_split"]
    assert g["vision"] > 0 and g["decoder"] > 0 and g["head"] > 0


def test_mixed_mfu_fields_accounting():
    """Per-precision floors: all-bf16 mixed floor equals the
    single-precision mfu_fields floor on the same total FLOPs; quantizing
    a component halves only ITS floor contribution."""
    import bench
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.flops import full_step_flops
    cfg = MODEL_REGISTRY["tiny"]()
    e = cfg.n_layers - 1
    # low fake peak so the tiny model's floors land in a range where
    # mfu_fields' 3-decimal floor_ms rounding is negligible
    peak = 0.001
    t = 0.05
    all_bf = {"vision": "bf16", "decoder": "bf16", "head": "bf16"}
    m_bf = bench.mixed_mfu_fields(cfg, e, t, peak, all_bf)
    single = bench.mfu_fields(full_step_flops(cfg, e), t, peak)
    assert abs(m_bf["mixed_floor_ms"] - single["floor_ms"]) < 0.01 * max(
        single["floor_ms"], 1e-6), (m_bf, single)
    assert abs(m_bf["mixed_mfu"] - single["mfu"]) < 0.02 * max(
        single["mfu"], 1e-9)
    # int8 decoder: floor shrinks by exactly half the decoder term
    m_dec = bench.mixed_mfu_fields(cfg, e, t, peak,
                                   {**all_bf, "decoder": "int8"})
    g_dec = m_bf["gflops_split"]["decoder"]
    expect = m_bf["mixed_floor_ms"] - 1000 * g_dec / (peak * 1e3) / 2
    assert abs(m_dec["mixed_floor_ms"] - expect) < 0.02 * max(expect, 1e-6)
    assert m_dec["mixed_mfu"] < m_bf["mixed_mfu"]
    # no peak (CPU): only the FLOPs split comes back
    m_cpu = bench.mixed_mfu_fields(cfg, e, t, 0.0, all_bf)
    assert set(m_cpu) == {"gflops_split"}


def test_calibration_section_structure(monkeypatch):
    """detail.calibration (VERDICT r4 item 3): folded AND streamed TVs from
    the same held-out probe, structurally sound — CPU-tested at tiny before
    the driver records it at 3B on hardware."""
    import bench
    _silence_sections(monkeypatch, keep=("CALIB",))
    result = bench.run_model("tiny", emit_cb=None)
    c = result["detail"]["calibration"]
    assert "error" not in c and "skipped" not in c, c
    for k in ("folded_tv", "streamed_tv"):
        assert 0.0 <= c[k] <= 1.0, c
    assert abs(sum(c["folded_hist"]) - 1.0) < 1e-6
    assert abs(sum(c["streamed_hist"]) - 1.0) < 1e-6
    assert abs(sum(c["target_probs"]) - 1.0) < 1e-3
    assert c["steps"] == c["n_streams"] * (128 // c["n_streams"])
    # the regime-matched calibration must never be materially WORSE than
    # the folded one on its own serving regime (the contract tests assert
    # the strictly-better claim with a bigger probe)
    assert c["streamed_tv"] <= c["folded_tv"] + 0.1, c


def test_bench_report_renders_maximal_artifact(tmp_path, capsys):
    """scripts/bench_report.py must render every section of a maximal
    artifact (and the checked-in rehearsal artifact) without raising."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_report",
        Path(__file__).resolve().parent.parent / "scripts"
        / "bench_report.py")
    br = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(br)
    p = tmp_path / "art.json"
    p.write_text(json.dumps(_maximal_fake_result()))
    br.main(str(p))
    out = capsys.readouterr().out
    for frag in ("stacked peak B=48", "w8a8_decoder_only",
                 "exit agreement", "Calibration regimes",
                 "Truncated 9B capacity modes"):
        assert frag in out, frag
    real = Path(__file__).resolve().parent.parent / "runs" \
        / "bench_rehearsal_r05_full.json"
    if real.exists():
        br.main(str(real))
        assert "actions/s" in capsys.readouterr().out


def _maximal_fake_result():
    """Every section the bench can ever produce, populated — the worst-case
    artifact the compact summary must digest under the size bound."""
    mfu = {"gflops_per_unit": 123.45, "achieved_tflops": 99.99,
           "mfu": 0.5078, "floor_ms": 1.057}
    sect = {"actions_per_sec": 1234.56, "speedup_vs_bf16": 1.234,
            "bf16_adjacent_actions_per_sec": 999.99,
            "speedup_vs_exact": 1.456, "analytic_flops_ratio": 0.641, **mfu}
    modes = {
        "bf16": {"full_depth_actions_per_sec": 70.25,
                 "resident_weights_mb": 6412.3},
        "int8_w8a8": {"full_depth_actions_per_sec": 116.75,
                      "resident_weights_mb": 3207.1,
                      "speedup_vs_bf16": 1.662,
                      "batched32_full_depth_actions_per_sec": 262.44,
                      "stacked_peak_tome8_grip84": {
                          "batched32_full_depth_actions_per_sec": 519.21,
                          "speedup_vs_exact": 1.978}},
        "int4_w8a8": {"full_depth_actions_per_sec": 81.02,
                      "resident_weights_mb": 1608.9},
    }
    return {
        "metric": "deer_b_3b_dynamic_exit_actions_per_sec_per_chip",
        "value": 126.62, "unit": "actions/s", "vs_baseline": 31.66,
        "detail": {
            "full_depth_actions_per_sec": 55.55,
            "batched32_full_depth_actions_per_sec": 237.51,
            "avg_exit_layer": 3.69,
            "per_depth_ms": [6.1] * 6, "sync_step_ms": 14.2,
            "execution_model": "while_loop_single_program",
            "backend": "axon", "peak_bf16_tflops": 197.0,
            "per_depth_gflops_per_action": [50.0] * 6,
            "dynamic_mfu": mfu, "full_depth_mfu": mfu,
            "batched32_mfu": mfu,
            "batched32_tome8": sect, "batched32_grip84": sect,
            "batched32_w8a8": {
                **sect,
                "stacked_peak_tome8_grip84": {
                    **sect,
                    "b48": {"actions_per_sec": 624.21,
                            "speedup_vs_b32": 1.056, **mfu}},
                "decomposition": {
                    "gflops_split": {"vision": 347.099824,
                                     "decoder": 69.457674,
                                     "head": 0.082317},
                    "configs": {n: {"actions_per_sec": 280.34,
                                    "ms_per_action": 3.567,
                                    "mixed_floor_ms": 1.05767,
                                    "mixed_mfu": 0.2965,
                                    "speedup_vs_bf16": 1.191}
                                for n in ("bf16", "w8a8_full",
                                          "w8a8_decoder_only",
                                          "w8a8_vision_only")}}},
            "int8": {**sect, "per_depth_ms": [5.0] * 6,
                     "bf16_adjacent_per_depth_ms": [6.0] * 6,
                     "exit_agreement": {
                         "steps": 128, "exit_agreement": 0.9531,
                         "mean_abs_exit_gap_layers": 0.047,
                         "fp_exit_hist": [20, 30, 25, 20, 18, 15],
                         "exit_ratio": 0.8,
                         "target_probs": [0.3, 0.24, 0.19, 0.15, 0.12,
                                          0.1]}},
            "calibration": {"folded_tv": 0.1612, "streamed_tv": 0.0655,
                            "n_streams": 8, "steps_per_stream": 48,
                            "serving_mix_degenerate": True,
                            "note": "x" * 120},
            "train_3b": {"samples_per_sec": 14.56, "step_ms": 412.0,
                         "batch_size": 6, "window": 12, **mfu},
            "train_pipeline": {"samples_per_sec": 13.33, "step_ms": 450.1,
                               "loader_idle_ms_per_step": 0.07,
                               "overlap_speedup": 1.08, **mfu},
            "mpt_9b": {"actions_per_sec": 70.11, "vs_baseline": 17.5,
                       "full_depth_actions_per_sec": 44.3,
                       "per_depth_ms": [10.0] * 6,
                       "dynamic_mfu": mfu, "full_depth_mfu": mfu,
                       "modes": modes},
        },
    }


@pytest.mark.quick
def test_compact_summary_bounded_and_complete():
    """VERDICT r4 item 1: the digest of a maximal artifact stays under 1 KB
    and still carries every headline scalar the judge compares."""
    import bench
    c = bench.compact_summary(_maximal_fake_result())
    line = json.dumps(c)
    assert len(line) < 1024, (len(line), line)
    assert c["value"] == 126.62 and c["vs_baseline"] == 31.66
    assert c["detail_file"] == "runs/bench_partial.json"
    s = c["summary"]
    for k in ("batched32_aps", "tome8_aps", "grip84_aps", "w8a8_aps",
              "peak_aps", "peak48_aps", "w8a8_mix_mfu", "w8a8_dec_aps",
              "train_mfu", "pipe_mfu", "int8_agree",
              "int8_hist_bins", "calib_folded_tv", "calib_streamed_tv",
              "calib_degen", "9b_aps", "9b_b32_aps", "9b_peak_aps",
              "9b_w8a8_mb"):
        assert k in s, (k, s)
    assert s["int8_hist_bins"] == 6
    assert json.loads(line) == c  # round-trips


def test_emit_prints_compact_line_last(monkeypatch, tmp_path, capsys):
    """The LAST stdout line after any emission with detail must be the
    <1 KB compact summary (the only line the driver tail window is
    guaranteed to hold); the full artifact line precedes it and mirrors
    byte-complete to disk."""
    import bench
    monkeypatch.setattr(bench, "PARTIAL_PATH",
                        str(tmp_path / "bench_partial.json"))
    result = _maximal_fake_result()
    bench.emit(result)
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert json.loads(lines[-1]) == bench.compact_summary(result)
    assert len(lines[-1]) < 1024
    assert json.loads(lines[-2]) == result
    # disk mirror = the FULL artifact, not the digest
    assert json.loads(
        (tmp_path / "bench_partial.json").read_text()) == result


@pytest.mark.quick
def test_emit_mirrors_to_partial_file(monkeypatch, tmp_path, capsys):
    import bench
    monkeypatch.setattr(bench, "PARTIAL_PATH",
                        str(tmp_path / "runs" / "bench_partial.json"))
    payload = {"metric": "m", "value": 1.5, "unit": "x", "vs_baseline": 0.1}
    bench.emit(payload)
    line = (tmp_path / "runs" / "bench_partial.json").read_text().strip()
    assert json.loads(line) == payload
    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert json.loads(out_lines[-1]) == payload


def test_peak_failure_leaves_w8a8_intact(monkeypatch):
    """VERDICT r3 item 4 acceptance: an induced stacked-peak failure leaves
    batched32_w8a8.actions_per_sec intact and records the error under the
    peak sub-key instead of replacing the whole dict."""
    import bench
    import deer_vla_tpu.eval.scan_policy as sp
    _silence_sections(monkeypatch, keep=("W8A8", "PEAK"))

    orig = sp.build_scan_step

    def boom(cfg, exit_ids, threshold_type="L2", max_layer=None, **kw):
        # the peak program is the only one built with tome_r=8 AND
        # gripper_res=84 — fail exactly there
        if getattr(cfg, "gripper_res", None) == 84 and cfg.vit.tome_r == 8:
            raise RuntimeError("induced peak failure")
        return orig(cfg, exit_ids, threshold_type, max_layer, **kw)

    monkeypatch.setattr(sp, "build_scan_step", boom)
    result = bench.run_model("tiny", emit_cb=None)
    w8 = result["detail"]["batched32_w8a8"]
    assert w8["actions_per_sec"] > 0, w8
    assert w8["speedup_vs_bf16"] > 0
    assert "induced peak failure" in \
        w8["stacked_peak_tome8_grip84"]["error"]
