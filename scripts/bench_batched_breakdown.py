"""Same-process component breakdown at serving batch B=32 (3B, full depth).

Where does the batched step's time go: dual ViT encode (64 images),
decoder stack, head checks, dispatch?  All programs take the packed trees;
chained variants thread real dependencies.

WARNING: the repeat-arg encode timing is dedupe-contaminated; the chained
fused measurement is honest only while the carry keeps changing — prefer
distinct inputs per iteration (bench_packed_ab2.py pattern).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("DEER_BB_B", "32"))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer, encode_vision
    from deer_vla_tpu.ops.lstm import zero_carry

    cfg = MODEL_REGISTRY["mpt_dolly_3b"](max_layer=12)
    params = jax.jit(lambda k: init_deer(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((B, s), 11, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((B, s), jnp.int32)

    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * 6)
    exits = pol.exits
    carry = zero_carry(cfg.head.lstm_num_layers, B, cfg.head.hidden_size,
                       jnp.float32)

    th = np.full(cfg.n_layers, -1e30, np.float32)
    for e in exits:
        th[e] = -1e8
    th[exits[-1]] = 1e30
    th_full = jnp.asarray(th)

    enc = jax.jit(lambda p, st, a, b: encode_vision(p, a, b, cfg, stacked=st))

    res = {}
    res[f"encode_B{B}_dual"] = timeit(enc, pol.params, pol.stacked, img, img)

    def fused(c):
        return pol._step(pol.params, pol.stacked, img, img, ids, mask, c,
                         th_full)

    # chained full-depth step (true serving dependency)
    for _ in range(3):
        arm, gp, carry2, el = fused(carry)
    jax.block_until_ready((arm, gp, carry2, el))
    assert int(el[0]) == exits[-1], int(el[0])
    t0 = time.perf_counter()
    iters = 20
    c = carry
    for _ in range(iters):
        arm, gp, c, el = fused(c)
    jax.block_until_ready((arm, gp, c, el))
    res[f"fused_B{B}_full_chained"] = (time.perf_counter() - t0) / iters * 1000

    for k, v in res.items():
        print(f"{k:28s} {v:9.3f} ms")
    aps = B / res[f"fused_B{B}_full_chained"] * 1000
    print(f"batched aggregate: {aps:.1f} actions/s")


if __name__ == "__main__":
    main()
