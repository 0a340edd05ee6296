"""Diffusion action head: 1-D conditional U-Net + DDPM sampler.

Port of DiffusionDecoder (action_head.py:848-1108) and ConditionalUnet1D
(unets.py:148-326, ConditionalResidualBlock1D :394-446, Conv1dBlock :56-80).

TPU-native choices:
  * conv1d as lax.conv_general_dilated (NCH); GroupNorm stats in fp32
  * the reverse-diffusion loop is a single `lax.scan` over timesteps inside
    one jitted program — the reference's Python p_sample_loop (150 host
    iterations, action_head.py:1028-1060) becomes one XLA program with
    on-device RNG
  * FiLM conditioning (scale/bias) identical to the torch code, including
    the cond_predict_scale=False default (bias-only).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.ops.layers import init_linear, linear


# ---------------------------------------------------------------------------
# schedules & buffers
# ---------------------------------------------------------------------------


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999).astype(np.float32)


@dataclass(frozen=True)
class DiffusionConfig:
    input_dim: int = 7
    horizon: int = 32
    global_cond_dim: int = 1024
    diffusion_step_embed_dim: int = 256
    down_dims: Tuple[int, ...] = (256, 512, 1024)
    kernel_size: int = 3
    n_groups: int = 8
    cond_predict_scale: bool = False
    n_timesteps: int = 150
    clip_denoised: bool = False
    predict_epsilon: bool = True


def ddpm_buffers(cfg: DiffusionConfig) -> dict:
    betas = cosine_beta_schedule(cfg.n_timesteps)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    return {k: jnp.asarray(v, jnp.float32) for k, v in {
        "betas": betas,
        "alphas_cumprod": ac,
        "sqrt_alphas_cumprod": np.sqrt(ac),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - ac),
        "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / ac),
        "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / ac - 1.0),
        "posterior_variance": post_var,
        "posterior_log_variance_clipped": np.log(np.clip(post_var, 1e-20, None)),
        "posterior_mean_coef1": betas * np.sqrt(ac_prev) / (1.0 - ac),
        "posterior_mean_coef2": (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
    }.items()}


# ---------------------------------------------------------------------------
# unet pieces
# ---------------------------------------------------------------------------


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _init_conv1d(key, c_in, c_out, k, dtype=jnp.float32):
    fan_in = c_in * k
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (c_out, c_in, k), dtype, -bound, bound),
            "b": jax.random.uniform(k2, (c_out,), dtype, -bound, bound)}


def conv1d(p, x, stride: int = 1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), padding,
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + p["b"].astype(x.dtype)[None, :, None]


def conv1d_transpose(p, x, stride: int = 2, torch_padding: int = 1):
    """ConvTranspose1d(dim, dim, 4, 2, 1) equivalence (unets.py:47-53).
    torch padding p maps to lax padding (k-1-p, k-1-p)."""
    k = p["w"].shape[-1]
    lp = k - 1 - torch_padding
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), (stride,), ((lp, lp),),
        dimension_numbers=("NCH", "IOH", "NCH"), transpose_kernel=True)
    return y + p["b"].astype(x.dtype)[None, :, None]


def group_norm(p, x, n_groups: int, eps: float = 1e-5):
    """x: (B, C, T); torch GroupNorm semantics, fp32 stats."""
    b, c, t = x.shape
    dt = x.dtype
    xg = x.astype(jnp.float32).reshape(b, n_groups, c // n_groups, t)
    mean = xg.mean(axis=(2, 3), keepdims=True)
    var = xg.var(axis=(2, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(b, c, t)
    y = y * p["scale"].astype(jnp.float32)[None, :, None] \
        + p["bias"].astype(jnp.float32)[None, :, None]
    return y.astype(dt)


def _init_conv_block(key, c_in, c_out, k, dtype):
    return {"conv": _init_conv1d(key, c_in, c_out, k, dtype),
            "gn": {"scale": jnp.ones((c_out,), dtype),
                   "bias": jnp.zeros((c_out,), dtype)}}


def conv_block(p, x, n_groups):
    return mish(group_norm(p["gn"], conv1d(p["conv"], x), n_groups))


def _init_res_block(key, c_in, c_out, cond_dim, cfg: DiffusionConfig, dtype):
    k = jax.random.split(key, 4)
    cond_channels = c_out * 2 if cfg.cond_predict_scale else c_out
    p = {
        "block0": _init_conv_block(k[0], c_in, c_out, cfg.kernel_size, dtype),
        "block1": _init_conv_block(k[1], c_out, c_out, cfg.kernel_size, dtype),
        "cond": init_linear(k[2], cond_dim, cond_channels, bias=True, dtype=dtype),
    }
    if c_in != c_out:
        p["res"] = _init_conv1d(k[3], c_in, c_out, 1, dtype)
    return p


def res_block(p, x, cond, cfg: DiffusionConfig):
    out = conv_block(p["block0"], x, cfg.n_groups)
    embed = linear(p["cond"], mish(cond))[:, :, None]  # (B, C[,2C], 1)
    if cfg.cond_predict_scale:
        c = out.shape[1]
        scale, bias = embed[:, :c], embed[:, c:]
        out = scale * out + bias
    else:
        out = out + embed
    out = conv_block(p["block1"], out, cfg.n_groups)
    res = conv1d(p["res"], x) if "res" in p else x
    return out + res


def init_unet(key, cfg: DiffusionConfig, dtype=jnp.float32) -> dict:
    all_dims = (cfg.input_dim,) + cfg.down_dims
    in_out = list(zip(all_dims[:-1], all_dims[1:]))
    dsed = cfg.diffusion_step_embed_dim
    cond_dim = dsed + (cfg.global_cond_dim or 0)
    keys = iter(jax.random.split(key, 64))
    p = {
        "time_fc1": init_linear(next(keys), dsed, dsed * 4, dtype=dtype),
        "time_fc2": init_linear(next(keys), dsed * 4, dsed, dtype=dtype),
        "down": [], "up": [],
        "mid": [_init_res_block(next(keys), all_dims[-1], all_dims[-1],
                                cond_dim, cfg, dtype) for _ in range(2)],
        "final_block": _init_conv_block(next(keys), cfg.down_dims[0],
                                        cfg.down_dims[0], cfg.kernel_size, dtype),
        "final_conv": _init_conv1d(next(keys), cfg.down_dims[0],
                                   cfg.input_dim, 1, dtype),
    }
    for i, (ci, co) in enumerate(in_out):
        is_last = i == len(in_out) - 1
        p["down"].append({
            "res0": _init_res_block(next(keys), ci, co, cond_dim, cfg, dtype),
            "res1": _init_res_block(next(keys), co, co, cond_dim, cfg, dtype),
            "down": None if is_last else _init_conv1d(next(keys), co, co, 3, dtype),
        })
    for i, (ci, co) in enumerate(reversed(in_out[1:])):
        is_last = i == len(in_out) - 1
        p["up"].append({
            "res0": _init_res_block(next(keys), co * 2, ci, cond_dim, cfg, dtype),
            "res1": _init_res_block(next(keys), ci, ci, cond_dim, cfg, dtype),
            "up": None if is_last else _init_conv1d(next(keys), ci, ci, 4, dtype),
        })
    return p


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half) * -emb)
    emb = t[..., None].astype(jnp.float32) * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], -1)


def unet_forward(p: dict, sample: jnp.ndarray, timestep: jnp.ndarray,
                 cfg: DiffusionConfig,
                 global_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sample: (B, H, input_dim); timestep: (B,) -> (B, H, input_dim)."""
    x = jnp.swapaxes(sample, 1, 2)  # (B, C, H)
    t_emb = sinusoidal_pos_emb(timestep, cfg.diffusion_step_embed_dim)
    t_emb = linear(p["time_fc2"], mish(linear(p["time_fc1"], t_emb)))
    cond = t_emb if global_cond is None else jnp.concatenate(
        [t_emb, global_cond.astype(t_emb.dtype)], -1)

    h = []
    for dm in p["down"]:
        x = res_block(dm["res0"], x, cond, cfg)
        x = res_block(dm["res1"], x, cond, cfg)
        h.append(x)
        if dm["down"] is not None:
            x = conv1d(dm["down"], x, stride=2)
    for m in p["mid"]:
        x = res_block(m, x, cond, cfg)
    for um in p["up"]:
        x = jnp.concatenate([x, h.pop()], axis=1)
        x = res_block(um["res0"], x, cond, cfg)
        x = res_block(um["res1"], x, cond, cfg)
        if um["up"] is not None:
            x = conv1d_transpose(um["up"], x, stride=2)
    x = conv_block(p["final_block"], x, cfg.n_groups)
    x = conv1d(p["final_conv"], x)
    return jnp.swapaxes(x, 1, 2)


# ---------------------------------------------------------------------------
# DDPM decoder
# ---------------------------------------------------------------------------


def predict_start_from_noise(buf, x_t, t, noise, cfg: DiffusionConfig):
    if cfg.predict_epsilon:
        return (buf["sqrt_recip_alphas_cumprod"][t][:, None, None] * x_t
                - buf["sqrt_recipm1_alphas_cumprod"][t][:, None, None] * noise)
    return noise


def q_posterior(buf, x_start, x_t, t):
    mean = (buf["posterior_mean_coef1"][t][:, None, None] * x_start
            + buf["posterior_mean_coef2"][t][:, None, None] * x_t)
    return mean, buf["posterior_log_variance_clipped"][t][:, None, None]


def q_sample(buf, x_start, t, noise):
    """Forward noising for training (action_head.py:1081-1089)."""
    return (buf["sqrt_alphas_cumprod"][t][:, None, None] * x_start
            + buf["sqrt_one_minus_alphas_cumprod"][t][:, None, None] * noise)


def conditional_sample(params: dict, buf: dict, rng, cond_data: jnp.ndarray,
                       cond_mask: jnp.ndarray, cfg: DiffusionConfig,
                       global_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reverse-diffusion sampling as ONE lax.scan (p_sample_loop,
    action_head.py:1028-1060).  cond_mask=True positions are clamped to
    cond_data after every step (inpainting-style history conditioning)."""
    b = cond_data.shape[0]
    rng, k0 = jax.random.split(rng)
    x = jax.random.normal(k0, cond_data.shape, cond_data.dtype)
    x = jnp.where(cond_mask, cond_data, x)

    def step(carry, t):
        x, rng = carry
        rng, kn = jax.random.split(rng)
        tt = jnp.full((b,), t, jnp.int32)
        eps = unet_forward(params, x, tt, cfg, global_cond)
        x_recon = predict_start_from_noise(buf, x, tt, eps, cfg)
        if cfg.clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean, log_var = q_posterior(buf, x_recon, x, tt)
        noise = 0.5 * jax.random.normal(kn, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        x = jnp.where(cond_mask, cond_data, x)
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng),
                             jnp.arange(cfg.n_timesteps - 1, -1, -1))
    return x


def conditional_sample_ddim(params: dict, buf: dict, rng,
                            cond_data: jnp.ndarray, cond_mask: jnp.ndarray,
                            cfg: DiffusionConfig,
                            global_cond: Optional[jnp.ndarray] = None,
                            steps: int = 10,
                            eta: float = 0.0) -> jnp.ndarray:
    """DDIM sampler (Song et al. 2021): `steps` U-Net evaluations over a
    timestep subsequence instead of cfg.n_timesteps; eta=0 is the
    deterministic ODE limit.  Beyond the reference — its sampling loop
    always runs the full DDPM chain (action_head.py:1028-1060).  Same
    inpainting-style cond_mask clamping as conditional_sample."""
    b = cond_data.shape[0]
    steps = int(min(max(1, steps), cfg.n_timesteps))
    taus = np.unique(np.round(np.linspace(0, cfg.n_timesteps - 1, steps))
                     ).astype(np.int32)[::-1]
    taus_prev = np.concatenate([taus[1:], [-1]]).astype(np.int32)
    # alphas_cumprod extended so index t+1 covers t = -1 -> 1.0
    ac_ext = jnp.concatenate([jnp.ones((1,), jnp.float32),
                              buf["alphas_cumprod"]])
    rng, k0 = jax.random.split(rng)
    x = jax.random.normal(k0, cond_data.shape, cond_data.dtype)
    x = jnp.where(cond_mask, cond_data, x)

    def step_fn(carry, tp):
        x, rng = carry
        t, t_prev = tp
        rng, kn = jax.random.split(rng)
        tt = jnp.full((b,), t, jnp.int32)
        model_out = unet_forward(params, x, tt, cfg, global_cond)
        x0 = predict_start_from_noise(buf, x, tt, model_out, cfg)
        if cfg.clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        a_t = ac_ext[t + 1]
        a_prev = ac_ext[t_prev + 1]
        # epsilon consistent with the (clipped / x0-predicting) model output
        eps = (x - jnp.sqrt(a_t) * x0) * jax.lax.rsqrt(1.0 - a_t)
        sigma = (eta * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
                 * jnp.sqrt(1.0 - a_t / a_prev))
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma * sigma, 0.0)) * eps
        noise = jax.random.normal(kn, x.shape, x.dtype)
        x = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise
        # at t_prev = -1, a_prev = 1 and sigma = 0: x collapses to x0
        x = jnp.where(cond_mask, cond_data, x)
        return (x, rng), None

    (x, _), _ = jax.lax.scan(
        step_fn, (x, rng),
        (jnp.asarray(np.ascontiguousarray(taus)),
         jnp.asarray(np.ascontiguousarray(taus_prev))))
    return x


def diffusion_loss(params: dict, buf: dict, rng, x_start: jnp.ndarray,
                   cfg: DiffusionConfig,
                   global_cond: Optional[jnp.ndarray] = None,
                   cond_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Epsilon-prediction MSE (standard DDPM training objective)."""
    b = x_start.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, cfg.n_timesteps)
    noise = jax.random.normal(rng_n, x_start.shape, x_start.dtype)
    x_noisy = q_sample(buf, x_start, t, noise)
    if cond_mask is not None:
        x_noisy = jnp.where(cond_mask, x_start, x_noisy)
    pred = unet_forward(params, x_noisy, t, cfg, global_cond)
    target = noise if cfg.predict_epsilon else x_start
    err = jnp.square(pred - target)
    if cond_mask is not None:
        err = jnp.where(cond_mask, 0.0, err)
    return err.mean()
