"""Golden-value regression: the tiny model's fixed-exit forward output is
pinned for a fixed init/input seed.  Guards semantic drift across refactors
(attention math, layer order, head pipeline, preprocessing) between rounds.
If a change is INTENTIONALLY semantics-altering, regenerate with the script
in the docstring below and explain why in the commit message.

Regenerate:
  JAX_PLATFORMS=cpu python - <<'EOF'
  import jax; jax.config.update('jax_platforms','cpu')
  jax.config.update('jax_default_matmul_precision','highest')
  ... (see test body; print actions/gripper for seed 1234 / input seed 7)
  EOF
"""

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import forward_fixed_exit, init_deer

# regenerated 2026-08-16: kaiming_uniform bound corrected to 1/sqrt(fan_in)
# (was sqrt(3)x too wide vs torch.nn.Linear default) — init-distribution
# change, intentional
GOLDEN_ACTIONS = np.array([
    0.16388384997844696, -0.13194869458675385, 0.22572089731693268,
    0.22978034615516663, 0.2525993287563324, -0.0644400417804718,
], np.float32)
GOLDEN_GRIPPER = 0.4743303954601288


def test_fixed_exit_golden():
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(1234), cfg)
    r = np.random.RandomState(7)
    img = jnp.asarray(r.randn(1, 1, 1, 3, 28, 28), jnp.float32)
    grip = jnp.asarray(r.randn(1, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((1, 8), 42, np.int32)
    ids[0, 0] = cfg.media_token_id
    out, _ = forward_fixed_exit(params, img, jnp.asarray(ids),
                                jnp.ones((1, 8), jnp.int32), cfg, exit_id=3,
                                vision_gripper=grip)
    np.testing.assert_allclose(np.asarray(out.actions[0, 0]), GOLDEN_ACTIONS,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.gripper_probs[0, 0, 0]),
                               GOLDEN_GRIPPER, rtol=1e-4)


def test_fusion_encode_golden():
    """Pin the fusion-variant encode outputs (seed 1234 / input seed 7,
    window 2): guards the pre token-union resample, the vit_concat window
    fold, and the use_hist frame-embedding add against silent drift.
    Regenerate with the script pattern above if intentionally changed."""
    import dataclasses
    from deer_vla_tpu.models.flamingo import encode_vision

    golden = {
        ("pre", False): ((2, 1, 8, 64), -9.998144149780273),
        ("vit_concat", False): ((1, 1, 32, 64), -19.99408721923828),
        ("post", True): ((2, 1, 16, 64), -14.835199356079102),
    }
    with jax.default_matmul_precision("highest"):
        for (mode, hist), (shape, ssum) in golden.items():
            cfg = deer_tiny()
            cfg = dataclasses.replace(
                cfg, fusion_mode=mode, use_hist=hist, window_size=2,
                head=dataclasses.replace(cfg.head, window_size=2))
            params = init_deer(jax.random.PRNGKey(1234), cfg)
            r = np.random.RandomState(7)
            rgb = jnp.asarray(r.randn(2, 1, 1, 3, 28, 28), jnp.float32)
            gpr = jnp.asarray(r.randn(2, 1, 1, 3, 28, 28), jnp.float32)
            m = np.asarray(jax.jit(
                lambda p, a, b, c=cfg: encode_vision(p, a, b, c,
                                                     window_size=2))(
                params, rgb, gpr))
            assert m.shape == shape, (mode, hist, m.shape)
            np.testing.assert_allclose(float(m[..., :3].sum()), ssum,
                                       rtol=1e-5)
