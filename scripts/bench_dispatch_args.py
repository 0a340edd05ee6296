"""Is per-dispatch overhead proportional to argument-leaf count?

Times a TRIVIAL jitted function (sum of one leaf) against argument pytrees
of increasing leaf count, device-pipelined.  If dispatch cost grows by
~µs/leaf, the while-loop policy step's fixed cost is dominated by marshaling
its ~10^3-leaf params+stacked arguments, and a consolidated serving bundle
(stacked ViT/perceiver/heads) is the fix.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    @jax.jit
    def trivial(tree):
        return jax.tree_util.tree_leaves(tree)[0].sum()

    for n_leaves in (1, 64, 256, 1024, 2048):
        tree = {str(i): jnp.ones((8, 8), jnp.float32) for i in range(n_leaves)}
        jax.block_until_ready(tree)
        ms = timeit(trivial, tree)
        print(f"leaves={n_leaves:5d}  {ms:7.3f} ms/dispatch")

    # the real policy step's leaf counts for reference
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.eval.scan_policy import stack_decoder_layers
    cfg = MODEL_REGISTRY["mpt_dolly_3b"](max_layer=12)
    params = jax.eval_shape(lambda k: init_deer(k, cfg), jax.random.PRNGKey(0))
    n_p = len(jax.tree_util.tree_leaves(params))
    print(f"3B params leaves: {n_p}")


if __name__ == "__main__":
    main()
