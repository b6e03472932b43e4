"""AdamW with int8-quantized optimizer state — the TPU-native equivalent of
bitsandbytes' AdamW8bit (reference: trainer/optimizer.py:17-19 for the
"AdamW8bit" option).

bitsandbytes saves optimizer HBM with CUDA kernels doing block-wise DYNAMIC
(non-linear) quantization of the Adam moments; here the same idea runs as
ordinary XLA ops inside the jitted step. Both moments are stored as uint8
indices into a geometric codebook spanning 7 decades (plus one fp32 absmax
scale per 2048-element block) — linear absmax int8 would zero the small
second-moment entries and 1/sqrt(v) would explode:

    fp32 moments of an SDXL full finetune:  2 x 4 B x 2.57 B params = 20.6 GB
    uint8 + scales:                          2 x (1 B + 4/2048 B)   =  5.2 GB

For LoRA runs the states are tiny and plain AdamW is used; this transform is
selected by `unet_optimizer_type: "AdamW8bit"` and matters for (FSDP) full
finetunes where moment memory competes with activations. Update math happens
in fp32 each step (dequantize -> update -> requantize).
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

BLOCK = 2048


def _pad_len(n: int) -> int:
    return (n + BLOCK - 1) // BLOCK * BLOCK


# 8-bit dynamic codebooks — bitsandbytes' exact `create_dynamic_map`
# (bitsandbytes/functional.py; the datatype from "8-bit Optimizers via
# Block-wise Quantization", Dettmers et al. 2022). Linear absmax quantization
# zeroes small entries, and Adam's second moment spans many decades within a
# block — 1/sqrt(v) then explodes. The dynamic datatype spends ~3 bits on a
# base-10 exponent (7 decades) and the rest on a linear fraction, keeping
# RELATIVE precision: 2^i fraction values in the i-th decade (signed), with
# exact 0 and 1.0 appended. Using bnb's exact code values (not just the same
# scheme) makes quantized moments BIT-compatible with bitsandbytes states:
# a (q, absmax) pair exported here dequantizes identically under bnb and
# vice versa. Pinned by tests/golden/bnb_dynamic_map.json.
def _create_dynamic_map(signed: bool, max_exponent_bits: int = 7, total_bits: int = 8):
    import numpy as np

    data = []
    non_sign_bits = total_bits - 1
    additional_items = 2 ** (non_sign_bits - max_exponent_bits) - 1
    for i in range(max_exponent_bits):
        fraction_items = int(
            2 ** (i + non_sign_bits - max_exponent_bits) + 1
            if signed
            else 2 ** (i + non_sign_bits - max_exponent_bits + 1) + 1
        )
        boundaries = np.linspace(0.1, 1, fraction_items)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
        if signed:
            data += (-(10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
    if additional_items > 0:
        boundaries = np.linspace(0.1, 1, additional_items + 1)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1)) * means).tolist()
        if signed:
            data += (-(10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1)) * means).tolist()
    data.append(0)
    data.append(1.0)
    gap = 256 - len(data)
    data += [0] * gap
    data.sort()
    return jnp.asarray(data, jnp.float32)


_UMAP = _create_dynamic_map(signed=False)
_SMAP = _create_dynamic_map(signed=True)
# index of exact 0 in each sorted map (moment init state)
_UZERO = 0
_SZERO = 127


def _nearest_index(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest codebook entry (codebook sorted ascending)."""
    idx = jnp.searchsorted(codebook, x)
    idx = jnp.clip(idx, 1, codebook.size - 1)
    left = codebook[idx - 1]
    right = codebook[idx]
    pick_left = (x - left) < (right - x)
    return jnp.where(pick_left, idx - 1, idx).astype(jnp.uint8)


def quantize_blockwise(x: jnp.ndarray, signed: bool = True):
    """fp32 -> (uint8 codebook indices, per-block fp32 absmax scales)."""
    flat = x.astype(jnp.float32).ravel()
    pad = _pad_len(flat.size) - flat.size
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax, 1.0)
    normed = blocks / scale
    codebook = _SMAP if signed else _UMAP
    q = _nearest_index(normed, codebook)
    return q, scale[:, 0]


def dequantize_blockwise(
    q: jnp.ndarray, scale: jnp.ndarray, shape, signed: bool = True
) -> jnp.ndarray:
    codebook = _SMAP if signed else _UMAP
    flat = (jnp.take(codebook, q.astype(jnp.int32)) * scale[:, None]).ravel()
    size = 1
    for s in shape:
        size *= s
    return flat[:size].reshape(shape)


class _QuantMoment(NamedTuple):
    q: jnp.ndarray  # int8 [n_blocks, BLOCK]
    scale: jnp.ndarray  # fp32 [n_blocks]


class AdamW8bitState(NamedTuple):
    count: jnp.ndarray
    mu: chex.ArrayTree  # of _QuantMoment
    nu: chex.ArrayTree  # of _QuantMoment


def adamw8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        def qzero(p, zero_idx):
            n_blocks = _pad_len(p.size) // BLOCK
            return _QuantMoment(
                q=jnp.full((n_blocks, BLOCK), zero_idx, jnp.uint8),
                scale=jnp.zeros((n_blocks,), jnp.float32),
            )

        return AdamW8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(lambda p: qzero(p, _SZERO), params),
            nu=jax.tree.map(lambda p: qzero(p, _UZERO), params),
        )

    def update_fn(grads, state, params):
        assert params is not None
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, p, mu_q, nu_q):
            g = g.astype(jnp.float32)
            m = dequantize_blockwise(mu_q.q, mu_q.scale, g.shape, signed=True)
            v = dequantize_blockwise(nu_q.q, nu_q.scale, g.shape, signed=False)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            m_hat = m / bc1
            v_hat = v / bc2
            step = -lr * (m_hat / (jnp.sqrt(v_hat) + eps) + weight_decay * p.astype(jnp.float32))
            new_mu = _QuantMoment(*quantize_blockwise(m, signed=True))
            new_nu = _QuantMoment(*quantize_blockwise(v, signed=False))
            return step.astype(p.dtype), new_mu, new_nu

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = jax.tree_util.tree_leaves(params)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [leaf(g, p, m, v) for g, p, m, v in zip(flat_g, flat_p, flat_mu, flat_nu)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return updates, AdamW8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
