"""Frozen-base weight quantization (QLoRA-style int8 kernels).

In LoRA mode the multi-GB base weights are read-only: gradients flow only
through the adapter pytree (models/lora.py). Storing the base matmul/conv
kernels as per-output-channel symmetric int8 (codes + fp32 scales) halves
their HBM residency vs bf16 — on SDXL that frees ~2.4 GB, which is exactly
the headroom the measured 16 GB activation frontier denied to every richer
`save:` remat plan (BENCH_NOTES.md round-4 table: each bf16 plan beyond the
flash residuals OOM'd by ~1 GB).

Dequantization happens at the point of use inside the (rematerialized) UNet
blocks: `QTensor.astype(dtype)` is duck-typed so every consumer site
(`models/layers.py` dense/conv2d, the fused qkv/kv matmuls in models/unet.py,
merge_lora) dequantizes exactly where a bf16 kernel would have been cast.
Under a remat policy the bf16 weight is therefore a short-lived per-block
transient, recomputed from the int8 codes in backward — the elementwise
dequant cost is ~1/(B*L) of the matmul it feeds. With remat OFF the
dequantized weights stay live from forward to backward and the savings
vanish; `quantize_base` is a lever for remat-on configs (SDXL @1024px), not
the SD15 remat-off path.

Accuracy: per-channel symmetric int8 keeps |w - dq(w)| <= max|w_col|/254
(~0.4% relative), the standard weight-only-quantization regime that is
near-lossless for diffusion UNets. The LoRA delta stays full precision, so
adapters can (and do) absorb residual base-quantization bias during training.
Parity bounds are pinned by tests/test_quant.py.

The reference has no equivalent (its base stays fp16/bf16 on a 40 GB A100,
reference trainer/models.py:7-54 loads via diffusers); this is a TPU-native
HBM lever like ops/stash8.py, off by default (config.quantize_base).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


class QTensor:
    """Per-output-channel symmetric int8 weight: w ~= q.astype(f32) * s.

    Registered as a pytree node (leaves: q, s) so it rides transparently
    through jit arguments, tree_map(device_put), and sharding annotation.
    Duck-types the small surface the layer code touches on a kernel leaf:
    .astype / .shape / .ndim / .dtype.
    """

    __slots__ = ("q", "s", "_dtype")

    def __init__(self, q, s, dtype=jnp.bfloat16):
        self.q = q  # int8 codes, original kernel shape
        self.s = s  # f32 scales, broadcast shape (1,...,out)
        self._dtype = jnp.dtype(dtype)

    # -- kernel-leaf duck typing ------------------------------------------
    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        """The LOGICAL dtype (what a dequantized kernel yields)."""
        return self._dtype

    def astype(self, dtype) -> jnp.ndarray:
        """Dequantize: int8 -> f32 (exact) -> scale -> cast."""
        return (self.q.astype(jnp.float32) * self.s).astype(dtype)

    def __repr__(self):
        return f"QTensor(shape={tuple(self.q.shape)}, dtype={self._dtype})"


jax.tree_util.register_pytree_node(
    QTensor,
    lambda t: ((t.q, t.s), str(t._dtype)),
    lambda dtype, qs: QTensor(qs[0], qs[1], dtype),
)


def quantize_kernel(w: jnp.ndarray, dtype=None) -> QTensor:
    """bf16/f32 kernel -> per-output-channel symmetric int8 QTensor.

    The output channel is the LAST axis for both dense (in, out) and conv
    HWIO kernels; scales reduce over all other axes.
    """
    dtype = dtype or w.dtype
    axes = tuple(range(w.ndim - 1))
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axes, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(wf / s).astype(jnp.int8)
    return QTensor(q, s, dtype)


_SKIP_LEAVES = frozenset({"conv_in", "conv_out"})  # tiny I/O boundary convs


def quantize_base_weights(tree: Any, _name: str = "") -> Any:
    """Quantize every 2-D/4-D "kernel" leaf of a frozen param tree to int8.

    Non-kernel leaves (biases, norm scales, embedding tables, time
    projections stored as kernels are 2-D and DO quantize) stay untouched;
    the model's I/O boundary convs (conv_in/conv_out, negligible bytes) are
    skipped for numeric safety. Already-quantized leaves pass through, so
    the transform is idempotent.
    """
    if isinstance(tree, dict):
        if "kernel" in tree and not isinstance(tree["kernel"], dict):
            k = tree["kernel"]
            if isinstance(k, QTensor) or _name in _SKIP_LEAVES:
                return tree
            if hasattr(k, "ndim") and k.ndim in (2, 4) and jnp.issubdtype(
                jnp.asarray(k).dtype, jnp.floating
            ):
                out = dict(tree)
                out["kernel"] = quantize_kernel(k)
                return out
            return tree
        return {k: quantize_base_weights(v, k) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_base_weights(v, _name) for v in tree)
    return tree


def quantized_bytes_saved(tree: Any) -> int:
    """Bytes of HBM freed by the quantization (bf16 -> int8 on each code)."""
    saved = 0
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jnp.ndarray) and leaf.dtype == jnp.int8:
            saved += leaf.size  # bf16(2B) -> int8(1B): one byte per element
    return saved
