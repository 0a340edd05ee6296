"""Quantify --lanes/--pipeline host/device overlap with a CPU-heavy env.

ROADMAP item: DebugEnv host work is too cheap to show the pipelined drive
loop doing anything; the real CALVIN simulator (pybullet physics + EGL
render) costs ~10-50 ms of HOST time per step.  This script injects that
cost (DebugEnv host_latency_ms) and A/Bs pipeline group counts in one
process: with pipeline=1 the harness serializes [device step -> host env
step] per batch; with pipeline=g, group k's env stepping overlaps the other
groups' device programs (eval/batched_rollout.py dispatch/finish split).

Measurement rules (CLAUDE.md): same-process, round-robin reps over
configurations, per-env observation jitter so no two dispatches are
bit-identical (the axon runtime dedupes identical repeat dispatches), and
wall time measured over the whole drive loop (the overlap IS a host/device
choreography property — per-dispatch timings can't see it).

Run: python scripts/bench_pipeline_overlap.py [model]   (default tiny; use
     mpt_dolly_3b on the TPU)
Env: DEER_LANES=8  DEER_PIPE=1,2,4  DEER_LAT_MS=0,10,30  DEER_SEQ=8
     DEER_EP_LEN=20  DEER_REPS=2  DEER_ENV_WORKERS=0,4 (thread-pooled env
     stepping A/B — the sleep releases the GIL exactly like pybullet/EGL)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LANES = int(os.environ.get("DEER_LANES", "8"))
PIPES = [int(x) for x in os.environ.get("DEER_PIPE", "1,2,4").split(",")]
LATS = [float(x) for x in os.environ.get("DEER_LAT_MS", "0,10,30").split(",")]
NSEQ = int(os.environ.get("DEER_SEQ", "8"))
EP_LEN = int(os.environ.get("DEER_EP_LEN", "20"))
REPS = int(os.environ.get("DEER_REPS", "2"))
WORKERS = [int(x)
           for x in os.environ.get("DEER_ENV_WORKERS", "0,4").split(",")]


def main():
    import jax
    if os.environ.get("DEER_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
    from deer_vla_tpu.eval.rollout import (DebugEnv, DebugTaskOracle,
                                           make_debug_sequences)
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer

    model = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    factory = MODEL_REGISTRY[model]
    cfg = factory() if model == "tiny" else factory(max_layer=12)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    import dataclasses
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    class JitterEnv(DebugEnv):
        """Per-call observation noise: no two dispatches are bit-identical
        across lanes or reps (axon dedupe defense)."""

        def get_obs(self):
            obs = super().get_obs()
            for k in ("rgb_static", "rgb_gripper"):
                im = obs["rgb_obs"][k].astype(np.int16)
                im += self._r.randint(0, 7, im.shape).astype(np.int16)
                obs["rgb_obs"][k] = np.clip(im, 0, 255).astype(np.uint8)
            return obs

    policy = ScanDeerPolicy(params, cfg, max_layer=cfg.n_layers)
    exits = list(cfg.all_exit_ids())
    # mid-depth thresholds: a realistic exit mix (some lanes exit early,
    # some run deep) is where the pipeline's slowest-group overlap matters
    policy.set_thresholds({e: 0.05 for e in exits[:-1]} | {exits[-1]: 1e9})
    oracle = DebugTaskOracle(threshold=1e9)  # never succeed: fixed ep_len
    sequences = make_debug_sequences(NSEQ)

    results = {}
    seed = [0]

    def run(pipe, lat, workers):
        envs = []
        for i in range(LANES):
            seed[0] += 1
            envs.append(JitterEnv(img_hw=cfg.vit.image_size,
                                  grip_hw=cfg.vit.image_size,
                                  seed=seed[0], host_latency_ms=lat))
        t0 = time.perf_counter()
        evaluate_policy_batched(
            policy, envs, sequences, {}, oracle, tok,
            text_len=cfg.text_len, ep_len=EP_LEN, n_layers=cfg.n_layers,
            pipeline=pipe, env_workers=workers)
        dt = time.perf_counter() - t0
        steps = NSEQ * EP_LEN  # each chain fails its first subtask at cap
        return dt, steps

    # warmup: each pipeline value compiles its own group batch shape
    # (8 lanes / 2 groups = a batch-4 program etc.) — compile outside timing
    for pipe in PIPES:
        run(pipe, 0.0, 0)
    for rep in range(REPS):
        for lat in LATS:
            for pipe in PIPES:
                for w in WORKERS:
                    dt, steps = run(pipe, lat, w)
                    key = (lat, pipe, w)
                    results.setdefault(key, []).append(
                        steps / dt)  # env-steps/s aggregate
                    print(f"rep{rep} lat={lat:5.1f}ms pipeline={pipe} "
                          f"workers={w}: {steps / dt:8.1f} env-steps/s "
                          f"({dt:.2f}s)")

    print("\n== medians (env-steps/s, aggregate over "
          f"{LANES} lanes, {NSEQ} chains x {EP_LEN} steps) ==")
    out = {}
    for lat in LATS:
        base = np.median(results[(lat, PIPES[0], WORKERS[0])])
        for pipe in PIPES:
            for w in WORKERS:
                v = float(np.median(results[(lat, pipe, w)]))
                out[f"lat{lat}_pipe{pipe}_w{w}"] = v
                print(f"lat={lat:5.1f}ms pipeline={pipe} workers={w}: "
                      f"{v:8.1f} ({v / base:.2f}x vs pipe={PIPES[0]}/"
                      f"w={WORKERS[0]})")
    print(json.dumps({"model": model, "lanes": LANES, "results": out}))


if __name__ == "__main__":
    main()
