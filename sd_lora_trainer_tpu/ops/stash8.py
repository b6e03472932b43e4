"""int8 activation stashing for named-remat plans.

The 16 GB v5e frontier blocks every bf16 `save:` plan beyond the flash
residuals by ~1 GB (BENCH_NOTES.md round-4 lever table), and host offload is
memory-negative on this platform. Quantizing the *stashed* copy to int8 with
a per-row scale halves its HBM cost, making those plans fit — the ActNN /
GACT activation-compression idea expressed in JAX remat terms.

Mechanics: `stash8(x, name)` is a custom_vjp whose forward quantizes x
row-wise (last axis, symmetric int8), tags BOTH the int8 codes and the f32
scales with `checkpoint_name(name)`, and returns the dequantized value. All
consumers see the dequantized x̃ in forward AND backward — the math is
consistent, with a straight-through gradient (identity) through the
quantizer. Under a `save:<name>` remat policy (models/unet.py
_named_policy_remat) the policy saves the int8 pair; backward recompute of
x̃ is one cheap dequant, and the producer of x is pruned from the recompute
graph — exactly what saving the bf16 tensor achieves, at half the bytes.

Without a naming policy the tags are inert and stash8 degenerates to a
fwd/bwd-consistent fake-quant of the activation (still recomputed).

No reference counterpart: the torch reference (trainer/main.py) relies on
diffusers' gradient_checkpointing with no memory-plan control at all.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_rowwise(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row (last-axis) int8 quantization.

    Returns (codes int8 [..., D], scales f32 [..., 1]). Row-wise scaling
    bounds the relative error by ~1/254 of each row's max — much tighter
    than a per-tensor scale on activations whose magnitude varies by layer
    position and token.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def dequantize_rowwise(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


@functools.lru_cache(maxsize=None)
def _stash8_named(name: str):
    from jax.ad_checkpoint import checkpoint_name

    @jax.custom_vjp
    def f(x):
        q, s = quantize_rowwise(x)
        return dequantize_rowwise(q, s, x.dtype)

    def fwd(x):
        q, s = quantize_rowwise(x)
        # Same tag on codes and scales: one `save:<name>` entry keeps both
        # (the flash kernel does the same for its l/m pair under flash_lse).
        q = checkpoint_name(q, name)
        s = checkpoint_name(s, name)
        return dequantize_rowwise(q, s, x.dtype), ()

    def bwd(_res, g):
        # Straight-through: round() has zero gradient a.e., but the
        # quantizer approximates identity, so pass g through unchanged.
        return (g,)

    f.defvjp(fwd, bwd)
    return f


def stash8(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Fake-quantize x to row-wise int8, tagging the stash for remat saves."""
    return _stash8_named(name)(x)


def expand_names(raw: str, channels) -> list:
    """Expand a comma list of checkpoint names; a trailing '*' expands over
    the per-level channel suffixes (e.g. 'attn_out*' -> 'attn_out_c320', ...).
    Shared by _named_policy_remat and the stash8 spec so both grammars match.
    """
    names = []
    for n in raw.split(","):
        n = n.strip()
        if n.endswith("*"):
            names += [n[:-1] + f"_c{c}" for c in sorted(set(channels))]
        elif n:
            names.append(n)
    return names
