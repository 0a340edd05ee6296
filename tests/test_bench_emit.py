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
    for k in ("TOME", "GRIP", "W8A8", "PEAK", "INT8", "9B_MODES"):
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
                      keep=("TOME", "GRIP", "W8A8", "INT8", "9B_MODES"))
    monkeypatch.setattr(bench, "BUDGET_S", 0.0)
    result = bench.run_model("tiny", emit_cb=None)
    d = result["detail"]
    assert result["value"] > 0
    assert d["batched32_full_depth_actions_per_sec"] > 0
    for k in ("batched32_tome8", "batched32_grip84", "batched32_w8a8",
              "int8"):
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
