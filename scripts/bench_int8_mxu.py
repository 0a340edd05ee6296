"""Probe: does int8 x int8 -> int32 matmul beat bf16 on this chip's MXU?

Decides whether a w8a8 (quantized-activation) path for the COMPUTE-bound
batched serving step is worth building: weight-only int8 only helps
bandwidth-bound steps; at B=32 the step is MXU-bound, so a win there needs
the MXU's native int8 throughput (2x bf16 on v5e per the spec).

Measurement rules per CLAUDE.md: distinct inputs per dispatch,
dependency-chained (each matmul consumes the previous output), one sync at
the end, bf16/int8 interleaved in the same process.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain(step, x0, ys, iters):
    x = x0
    for i in range(iters):
        x = step(x, ys[i])
    jax.block_until_ready(x)
    return x


def main():
    M, K, N = 1024, 2048, 8192
    iters, warm = 30, 5
    r = np.random.RandomState(0)
    w_bf = jnp.asarray(r.randn(K, N), jnp.bfloat16)
    w_q = jnp.asarray(r.randint(-127, 128, (K, N)), jnp.int8)

    @jax.jit
    def step_bf16(x, y):
        # y varies per call (dedupe protection); output feeds the next call
        z = jnp.dot((x + y).astype(jnp.bfloat16), w_bf,
                    preferred_element_type=jnp.float32)
        return z[:, :K] * 1e-3

    @jax.jit
    def step_int8(x, y):
        xi = jnp.clip(jnp.round(x + y), -127, 127).astype(jnp.int8)
        z = jax.lax.dot_general(xi, w_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return z[:, :K].astype(jnp.float32) * 1e-5

    x0 = jnp.asarray(r.randn(M, K), jnp.float32)
    ys = [jnp.asarray(r.randn(M, K), jnp.float32) for _ in range(iters + warm)]

    flops = 2 * M * K * N
    out = {}
    for name, step in [("bf16", step_bf16), ("int8", step_int8),
                       ("bf16_b", step_bf16), ("int8_b", step_int8)]:
        chain(step, x0, ys[:warm], warm)
        t0 = time.perf_counter()
        chain(step, x0, ys[warm:], iters)
        dt = (time.perf_counter() - t0) / iters
        out[name] = dt
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TFLOP/s",
              flush=True)
    print(f"speedup int8/bf16: "
          f"{min(out['bf16'], out['bf16_b']) / min(out['int8'], out['int8_b']):.2f}x")


if __name__ == "__main__":
    main()
