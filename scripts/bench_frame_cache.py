"""Frame-cache A/B at 3B: re-encode-the-window vs rolling per-frame token
cache for window-folded serving (VERDICT r2 item 7 'measured step-time
drop' half; equivalence half is tests/test_caching.py).

Measurement rules (CLAUDE.md): same process, DISTINCT image every step
(the runtime dedupes identical repeat dispatches), LSTM carry chained,
host readback every step (policy.step returns np arrays), A/B interleaved
round-robin so chip weather hits both arms equally.

Paths compared, identical serving semantics (tests prove action equality):
  full  — ScanDeerPolicy.step with the W-frame image window (the windowed
          adapter's re-encode protocol, reference eval_utils.py:344-386):
          2W ViT-L frames per step (rgb+gripper).
  cache — FrameCachePolicy.step with the newest frame only: 2 ViT-L frames
          per step + tiny concat + fused decode (reference feature_cache
          analogue, eval_utils.py:371).

Usage: python scripts/bench_frame_cache.py [model] [window] [iters]
"""

import dataclasses
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.caching import FrameCachePolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer

    model = sys.argv[1] if len(sys.argv) > 1 else "mpt_dolly_3b"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    warmup = 4

    cfg = MODEL_REGISTRY[model](max_layer=12, window_size=W)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, fusion_mode="vit_concat",
                              media_token_id=tok.media_token_id)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_exits = len(range(cfg.exit_interval - 1, cfg.mpt.n_layers,
                        cfg.exit_interval))

    hw, s = cfg.vit.image_size, cfg.text_len
    ids, mask = tok(["push the red block"])
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    full = ScanDeerPolicy(params, cfg, thresholds=[1e8] * n_exits)
    cache = FrameCachePolicy(ScanDeerPolicy(params, cfg,
                                            thresholds=[1e8] * n_exits))
    r = np.random.RandomState(0)
    n = warmup + iters
    imgs = [jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
            for _ in range(2 * n)]
    jax.block_until_ready(imgs)

    out = {"model": model, "window": W, "iters": iters}
    for depth, th in (("first_exit", [1e9] * n_exits),
                      ("full_depth", [-1e30] * n_exits)):
        full.set_thresholds(list(th))
        cache.inner.set_thresholds(list(th))
        full.reset()
        cache.reset()
        q_rgb, q_grip = deque(maxlen=W), deque(maxlen=W)
        t_full = t_cache = 0.0
        for i in range(n):
            img, grip = imgs[2 * i], imgs[2 * i + 1]
            if not q_rgb:
                for _ in range(W):
                    q_rgb.append(img), q_grip.append(grip)
            else:
                q_rgb.append(img), q_grip.append(grip)
            full.set_timestep(i)
            cache.set_timestep(i)
            # interleaved: window assembly is part of the full path's step
            t0 = time.perf_counter()
            a_full = full.step(jnp.concatenate(list(q_rgb), 0),
                               jnp.concatenate(list(q_grip), 0), ids, mask)
            t1 = time.perf_counter()
            a_cache = cache.step(img, grip, ids, mask)
            t2 = time.perf_counter()
            if i == 0:
                np.testing.assert_allclose(a_cache, a_full, rtol=1e-4,
                                           atol=1e-4)
            if i >= warmup:
                t_full += t1 - t0
                t_cache += t2 - t1
        ms_f, ms_c = t_full / iters * 1e3, t_cache / iters * 1e3
        out[depth] = {"full_ms": round(ms_f, 3), "cache_ms": round(ms_c, 3),
                      "speedup": round(ms_f / ms_c, 2)}
        print(f"{depth}: full {ms_f:8.2f} ms  cache {ms_c:8.2f} ms  "
              f"-> {ms_f / ms_c:.2f}x", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
