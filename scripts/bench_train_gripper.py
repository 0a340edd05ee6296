"""Same-process A/B: 3B joint-phase train step with the 224-upsampled
gripper (reference behavior) vs the native-resolution gripper tower
(--gripper_res 84).

Training runs the dual-camera encode on every one of the W=12 window frames,
so the wrist camera is ~24% of total train FLOPs at 224 — gripper_res=84
removes 34% of the analytic step FLOPs (eval/flops.train_step_flops).  The
train step is compute-bound on the chip (~0.8 MFU 3x-fwd convention), so
the cut should convert near 1:1.

Measurement discipline per CLAUDE.md: both programs share ONE TrainState
(gripper_res is weight-free); phases run adjacently in one process; every
step consumes DISTINCT images; one block_until_ready on ALL outputs per
phase.

Usage: python scripts/bench_train_gripper.py [--res 84] [--iters 8]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=84)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--model", default="mpt_dolly_3b")
    args = ap.parse_args()

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.flops import train_step_flops
    from deer_vla_tpu.models.flamingo import (cast_frozen_to_bf16, init_deer,
                                              trainable_mask)
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import (init_train_state,
                                               make_train_step)

    cfg = dataclasses.replace(MODEL_REGISTRY[args.model](max_layer=12),
                              remat_layers=True)
    cfg_nat = dataclasses.replace(cfg, gripper_res=args.res)

    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    mask = trainable_mask(params, cfg, "joint")
    params = jax.jit(lambda p: cast_frozen_to_bf16(p, mask))(params)
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-4,
                         warmup_steps=0, total_steps=1000, trainable=mask)
    state = init_train_state(params, opt)
    del params
    jax.block_until_ready(state)

    step_e = make_train_step(cfg, opt, phase="joint")

    B, hw, s, w = args.batch, cfg.vit.image_size, cfg.text_len, cfg.window_size
    r = np.random.RandomState(0)
    ids = np.full((B * w, s), 11, np.int32)
    ids[:, 0] = cfg.media_token_id
    base = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B * w, s), jnp.int32),
        "labels": jnp.asarray(np.clip(r.randn(B, w, 7) * 0.3, -1, 1),
                              jnp.float32),
    }
    grip224 = jnp.asarray(r.randn(B * w, 1, 1, 3, hw, hw), jnp.float32)
    n = args.iters + args.warmup
    # ONE shared image pool (B*w 224-res fp32 frames are ~260 MB each at
    # B=6/W=12 — a per-phase pool OOMs next to two programs' temps).  The
    # two phases run DIFFERENT programs, so reuse can't hit the runtime's
    # identical-dispatch dedupe.
    imgs = [jnp.asarray(r.randn(B * w, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(n)]
    rng = jax.random.PRNGKey(1)

    def phase(step, grip, pool, state):
        for i in range(args.warmup):
            state, metrics = step(state, dict(base, image=pool[i],
                                              gripper=grip),
                                  jax.random.fold_in(rng, i))
        jax.block_until_ready((state, metrics))
        t0 = time.perf_counter()
        for i in range(args.warmup, n):
            state, metrics = step(state, dict(base, image=pool[i],
                                              gripper=grip),
                                  jax.random.fold_in(rng, i))
        jax.block_until_ready((state, metrics))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(float(metrics["loss"])), metrics
        return dt, state

    te, state = phase(step_e, grip224, imgs, state)
    # free the exact program's executable, temps, and 224-res gripper
    # before the native program compiles (two 3B train programs + state
    # overflow a 16 GB chip by ~80 MB — the margin is that thin)
    del step_e, grip224
    jax.clear_caches()
    grip_nat = jnp.asarray(r.randn(B * w, 1, 1, 3, args.res, args.res),
                           jnp.float32)
    step_n = make_train_step(cfg_nat, opt, phase="joint")
    tn, state = phase(step_n, grip_nat, imgs, state)

    ge, gn = train_step_flops(cfg), train_step_flops(cfg_nat)
    out = {
        "res": args.res,
        "batch": B,
        "window": w,
        "step_ms_exact": round(1000 * te, 1),
        "step_ms_native": round(1000 * tn, 1),
        "samples_per_sec_exact": round(B / te, 2),
        "samples_per_sec_native": round(B / tn, 2),
        "speedup": round(te / tn, 3),
        "gf_per_sample_exact": round(ge, 0),
        "gf_per_sample_native": round(gn, 0),
        "analytic_flops_ratio": round(gn / ge, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
