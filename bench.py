"""Benchmark: DeeR-B (3B) dynamic-early-exit streaming inference on one TPU chip.

Metric: actions/sec/chip for the product inference path (BASELINE.json) —
dual-camera ViT-L encode + perceiver + N-layer MPT-flamingo decode + exit
head — averaged over the DeeR exit-layer distribution (exp, exit_ratio 0.8,
the paper's CALVIN-D operating point; README.md:111-127).  Each exit depth is
its own compiled bucket program, timed steady-state; the reported value is
the expectation of per-depth throughput under the exit distribution (exactly
what a rollout with calibrated thresholds pays, minus host/sim time).

vs_baseline anchor: the reference publishes no actions/sec; from its eval
cost (1000 sequences in ~4.5 h on 8x V100, README.md:126; ~650 env steps per
sequence incl. failed-task steps) the per-GPU policy rate is ~4 actions/s.
vs_baseline = ours / 4.0.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_ACTIONS_PER_SEC = 4.0


def main():
    from deer_vla_tpu.core.config import deer_3b
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.value_net import exit_probs
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.models.value_net import ExitController

    cfg = deer_3b(max_layer=12)  # DeeR-B
    rng = jax.random.PRNGKey(0)
    # jit the whole init: one compiled program on device (eager init would
    # dispatch thousands of ops over the axon tunnel)
    params = jax.jit(lambda k: init_deer(k, cfg))(rng)
    jax.block_until_ready(params)

    exits = list(cfg.all_exit_ids())
    ctrl = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: 0.0 for e in exits})  # never exit early via threshold
    policy = DeerPolicy(params, cfg, controller=ctrl)

    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 11, np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, s), jnp.int32)

    # Per-exit-depth streaming step timing.  We time the real bucket
    # programs: encode prefix + segments up to the chosen exit + head.
    def time_depth(n_buckets: int, iters: int = 30, warmup: int = 5) -> float:
        carry = None
        from deer_vla_tpu.ops.lstm import zero_carry
        carry = zero_carry(cfg.head.lstm_num_layers, 1, cfg.head.hidden_size,
                           jnp.float32)
        prev_action = jnp.zeros((1, 6), jnp.float32)

        def one_step():
            media, x, mloc = policy._encode_prefix(params, img, grip, ids, mask)
            out = None
            for k in range(n_buckets):
                start, e, fn, fn_first = policy._segments[k]
                x2, out, cand, delta = fn(params, x if k == 0 else x2, mask,
                                          media, mloc, carry, prev_action, None)
            return out.actions

        for _ in range(warmup):
            a = one_step()
        a.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            a = one_step()
        a.block_until_ready()
        return (time.perf_counter() - t0) / iters

    probs = exit_probs(len(exits), 0.8, "exp")
    per_depth_t = np.array([time_depth(k + 1) for k in range(len(exits))])
    # expected per-action latency under the exit distribution
    expected_t = float((probs * per_depth_t).sum())
    aps = 1.0 / expected_t
    aps_full = 1.0 / per_depth_t[-1]
    avg_exit_layer = float((probs * (np.array(exits) + 1)).sum())

    result = {
        "metric": "deer_b_3b_dynamic_exit_actions_per_sec_per_chip",
        "value": round(aps, 2),
        "unit": "actions/s",
        "vs_baseline": round(aps / REFERENCE_ACTIONS_PER_SEC, 2),
        "detail": {
            "full_depth_actions_per_sec": round(aps_full, 2),
            "avg_exit_layer": round(avg_exit_layer, 2),
            "per_depth_ms": [round(1000 * t, 2) for t in per_depth_t],
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
