"""Same-process A/B: aggregate HTTP serving throughput, per-stream core vs
the micro-batching core (deer-serve --batch_lanes).

Measures what a robot-fleet client sees: N concurrent streams each posting
frames to /v1/step as fast as the server answers, aggregate actions/s over
a fixed wall-clock window.  The per-stream core dispatches one B=1 program
per request; the batched core collates the same N streams into ONE batched
dispatch per window (bench.py's batched32 shows the chip sustains ~2x
aggregate throughput at B=32).

Measurement caveats on the tunneled axon chip (CLAUDE.md): every /v1/step
includes a device->host action readback, so absolute numbers are mostly
tunnel transport; only the SAME-PROCESS ratio between the two cores is
meaningful, and each stream sends DISTINCT frames every step (runtime
dedupe protection).

Usage:
  python scripts/bench_serve_httpd.py [--model mpt_dolly_3b] [--streams 16]
      [--seconds 20] [--tiny-cpu]   # --tiny-cpu: CPU smoke at deer_tiny
"""

import argparse
import base64
import dataclasses
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(model: str, lanes: int, precision: str):
    import jax
    from deer_vla_tpu.core.config import MODEL_REGISTRY, DTypePolicy
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.serving.batcher import BatchedActionServer
    from deer_vla_tpu.serving.server import DeerActionServer

    cfg = (MODEL_REGISTRY[model]() if model == "tiny"
           else MODEL_REGISTRY[model](max_layer=12))
    if precision == "bf16":
        cfg = dataclasses.replace(
            cfg, dtypes=DTypePolicy(param_dtype="bfloat16",
                                    compute_dtype="bfloat16"))
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    exits = list(cfg.all_exit_ids())
    th = [1e8] * len(exits)

    def per_stream():
        pol = ScanDeerPolicy(params, cfg, thresholds=th)
        return DeerActionServer(pol, tok, max_streams=lanes)

    def batched():
        pol = ScanDeerPolicy(params, cfg, thresholds=th)
        return BatchedActionServer(pol, tok, lanes=lanes, window_ms=3.0)

    return cfg, per_stream, batched


def drive(core, cfg, n_streams: int, seconds: float) -> dict:
    """n_streams closed-loop clients against the core (direct call — the
    stdlib HTTP layer adds identical JSON/socket cost to both cores and a
    ThreadingHTTPServer accept bottleneck we don't want to measure)."""
    counts = [0] * n_streams
    stop = threading.Event()

    def client(i):
        r = np.random.RandomState(1000 + i)
        # pre-generate distinct frames; re-randomize a pixel block per step
        rgb = r.randint(0, 255, (64, 64, 3), np.uint8)
        grip = r.randint(0, 255, (48, 48, 3), np.uint8)
        k = 0
        while not stop.is_set():
            rgb[k % 64, :, :] = r.randint(0, 255, (64, 3), np.uint8)
            payload = {
                "stream": f"s{i}", "instruction": f"task number {i}",
                "rgb": base64.b64encode(rgb.tobytes()).decode(),
                "rgb_shape": [64, 64, 3],
                "gripper": base64.b64encode(grip.tobytes()).decode(),
                "gripper_shape": [48, 48, 3],
            }
            out = core.step(payload)
            assert len(out["action"]) == 7
            counts[i] += 1
            k += 1

    # warmup: one step per stream to compile everything before timing
    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_streams)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    dt = time.perf_counter() - t0
    total = sum(counts)
    return {"actions_per_sec": round(total / dt, 2),
            "total_actions": total,
            "per_stream_min": min(counts), "per_stream_max": max(counts)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mpt_dolly_3b")
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--tiny-cpu", action="store_true",
                    help="CPU smoke: deer_tiny, 4 streams, 5 s")
    args = ap.parse_args()
    if args.tiny_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.model, args.streams, args.seconds = "tiny", 4, 5.0
        args.precision = "fp32"

    cfg, mk_per_stream, mk_batched = build(args.model, args.streams,
                                           args.precision)
    result = {"model": args.model, "streams": args.streams,
              "seconds": args.seconds}

    core = mk_per_stream()
    # compile warmup outside the timed window (shared by both cores'
    # engines but each compiles its own batch shape)
    drive(core, cfg, args.streams, 2.0)
    result["per_stream_core"] = drive(core, cfg, args.streams, args.seconds)
    del core

    core = mk_batched()
    drive(core, cfg, args.streams, 2.0)
    result["batched_core"] = drive(core, cfg, args.streams, args.seconds)
    core.shutdown()

    result["batched_vs_per_stream"] = round(
        result["batched_core"]["actions_per_sec"]
        / max(result["per_stream_core"]["actions_per_sec"], 1e-9), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
