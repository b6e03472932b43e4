"""Layer primitives over plain param pytrees.

Every model in this package is a pure function over a nested dict of arrays
(no module framework): weight conversion from single-file SD checkpoints, LoRA
injection, sharding annotation, and kohya export all become pytree
manipulations.

Conventions:
- activations NHWC; conv kernels HWIO (`jax.lax.conv_general_dilated` with
  ("NHWC","HWIO","NHWC") — the TPU-native layout).
- linear kernels are stored (in, out) so application is `x @ W` (row-vector
  convention; transposed from torch's (out, in)).
- a param dict may carry a "lora" subdict — `dense`/`conv2d` apply the
  low-rank path when present (see models/lora.py for injection). This is how
  the reference's peft-wrapped modules (trainer/optimizer.py:74-105) map onto
  functional JAX: adapters live in the same tree as the base weights but are
  injected/extracted as a separate pytree so only they receive gradients.

Matmuls run in the input dtype (bf16 on TPU) with fp32 accumulation via
`preferred_element_type` where precision matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _apply_lora_dense(p: dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """y += scale * (x @ A @ B), optionally DoRA-normalized.

    LoRA matrices are kept in fp32 (tiny) and the delta is computed in the
    activation dtype. `scale` = alpha / rank (reference sets
    alpha = rank * lora_alpha_multiplier, so scale == lora_alpha_multiplier).
    """
    lora = p["lora"]
    a = lora["a"].astype(x.dtype)  # (in, r)
    b = lora["b"].astype(x.dtype)  # (r, out)
    alpha = lora["alpha"]
    alpha = alpha.value if hasattr(alpha, "value") else alpha
    scale = alpha / a.shape[-1]
    delta = (x @ a) @ b * jnp.asarray(scale, x.dtype)
    if "magnitude" in lora:
        # DoRA (arXiv:2402.09353): W' = m * (W0 + s·BA) / ||W0 + s·BA||_col.
        w = p["kernel"].astype(jnp.float32) + (
            lora["a"] @ lora["b"] * scale
        )
        col_norm = jnp.linalg.norm(w, axis=0)  # (out,)
        m = lora["magnitude"] / jnp.maximum(col_norm, 1e-6)
        return ((y + delta).astype(jnp.float32) * m).astype(x.dtype)
    return y + delta


def dense(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ kernel (+ bias) (+ LoRA path when p['lora'] exists)."""
    y = x @ p["kernel"].astype(x.dtype)
    if "lora" in p:
        y = _apply_lora_dense(p, x, y)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d(
    p: dict,
    x: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel (+ optional conv-LoRA path).

    Conv LoRA follows peft's Conv2d adapter: A is a (kh,kw,in,r) conv with the
    base conv's stride/padding, B is a 1x1 (r,out) conv.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    kernel = p["kernel"].astype(x.dtype)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding, dimension_numbers=dn
    )
    if "lora" in p:
        lora = p["lora"]
        a = lora["a"].astype(x.dtype)  # (kh,kw,in,r)
        b = lora["b"].astype(x.dtype)  # (1,1,r,out)
        alpha = lora["alpha"]
        alpha = alpha.value if hasattr(alpha, "value") else alpha
        scale = jnp.asarray(alpha / a.shape[-1], x.dtype)
        ya = jax.lax.conv_general_dilated(
            x, a, window_strides=(stride, stride), padding=padding, dimension_numbers=dn
        )
        yb = jax.lax.conv_general_dilated(
            ya, b, window_strides=(1, 1), padding="VALID", dimension_numbers=dn
        )
        y = y + yb * scale
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def group_norm(p: dict, x: jnp.ndarray, groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of NHWC, fp32 statistics."""
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    out = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP-L activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0, flip_sin_to_cos: bool = True
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, fp32 (diffusers get_timestep_embedding
    semantics with downscale_freq_shift=0 as configured by SD checkpoints)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[..., None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    return emb


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample for NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
