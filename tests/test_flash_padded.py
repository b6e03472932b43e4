"""Padded segment-masked flash for aspect-ratio bucket shapes.

Real bucket resolutions produce self-attention lengths that are not
multiples of 128 (832x1216 -> 3952 tokens at SDXL level 1; 448x576 -> 4032
at SD15 level 0), which used to disqualify the Pallas kernel and fall back
to einsum attention with multi-GB logits. flash_mha now pads the sequence
to a tile-able length and masks the pad tokens with segment ids.

These tests run the REAL Pallas kernel on CPU via
pallas.tpu.force_tpu_interpret_mode() — numerics, masking, and gradients
are exercised without the chip; scripts/flash_parity_tpu.py re-checks the
compiled kernel on hardware at the full bucket lengths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_lora_trainer_tpu.ops.flash_attention import _pad_plan, flash_mha


def test_pad_plan():
    assert _pad_plan(4096) == (4096, 512, 1024)  # SDXL 1024px level 1 (unchanged)
    assert _pad_plan(256) == (256, 256, 256)
    assert _pad_plan(3952) == (4096, 512, 1024)  # 832x1216 bucket
    assert _pad_plan(4032) == (4096, 512, 1024)  # 448x576 sd15 bucket
    assert _pad_plan(300) == (384, 384, 384)
    # 128-multiples above 512 now pad to a 1024-multiple too: the 128/128
    # block fallback they used to take measured ~10x slower end-to-end at
    # the 768x1280 bucket (bench_logs/r5_ragged_diag.log)
    assert _pad_plan(3840) == (4096, 512, 1024)  # 768x1280 bucket
    assert _pad_plan(960) == (1024, 512, 1024)
    assert _pad_plan(640) == (1024, 512, 1024)
    assert _pad_plan(512) == (512, 512, 512)  # <=512 stays single-block


def _einsum_ref(q, k, v, heads):
    b, l, d = q.shape
    hd = d // heads
    def split(x):
        return x.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) / (hd**0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, l, d)


@pytest.mark.parametrize("L", [300, 256])  # padded (300->384) and exact
def test_flash_mha_padded_matches_einsum_fwd_and_grad(L):
    from jax.experimental.pallas.tpu import force_tpu_interpret_mode

    heads, hd = 2, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (1, L, heads * hd), jnp.float32)
    k = jax.random.normal(k2, (1, L, heads * hd), jnp.float32)
    v = jax.random.normal(k3, (1, L, heads * hd), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_mha(q, k, v, heads)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_einsum_ref(q, k, v, heads)))

    with force_tpu_interpret_mode():
        o_f = flash_mha(q, k, v, heads)
        g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    o_r = _einsum_ref(q, k, v, heads)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_r), atol=2e-5, rtol=0)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=0)
    assert np.isfinite(np.asarray(o_f)).all()


def test_flash_mha_stash8_out_close_to_exact():
    """stash8_out=True quantizes the kernel's output residual to int8; the
    primal output becomes dequant(quant(o)) — within the row-wise int8
    error bound of the exact kernel, with finite gradients."""
    from jax.experimental.pallas.tpu import force_tpu_interpret_mode

    heads, hd, L = 2, 64, 256
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (1, L, heads * hd), jnp.float32)
    k = jax.random.normal(k2, (1, L, heads * hd), jnp.float32)
    v = jax.random.normal(k3, (1, L, heads * hd), jnp.float32)

    with force_tpu_interpret_mode():
        o_exact = flash_mha(q, k, v, heads)
        o_q = flash_mha(q, k, v, heads, stash8_out=True)
        g = jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(flash_mha(q, k, v, heads, stash8_out=True)))
        )(q, k, v)
    err = np.abs(np.asarray(o_q) - np.asarray(o_exact))
    rowmax = np.abs(np.asarray(o_exact)).max()
    assert err.max() <= rowmax / 200, (err.max(), rowmax)
    assert np.isfinite(np.asarray(g)).all()


def test_flash_mha_pre_padded_matches_per_call_pad():
    """pre_padded: the caller pads once (models/unet.py module-level pad) and
    the kernel output keeps the padded length. Real rows must match the
    per-call-pad path exactly; grads through real rows must match too."""
    from jax.experimental.pallas.tpu import force_tpu_interpret_mode

    heads, hd, L = 2, 64, 300
    from sd_lora_trainer_tpu.ops.flash_attention import _pad_plan

    lp = _pad_plan(L)[0]
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (1, L, heads * hd), jnp.float32)
    k = jax.random.normal(k2, (1, L, heads * hd), jnp.float32)
    v = jax.random.normal(k3, (1, L, heads * hd), jnp.float32)

    def padded(x):
        return jnp.pad(x, ((0, 0), (0, lp - L), (0, 0)))

    def loss_pre(q, k, v):
        o = flash_mha(padded(q), padded(k), padded(v), heads, pre_padded=L)
        return jnp.sum(jnp.sin(o[:, :L]))

    def loss_percall(q, k, v):
        return jnp.sum(jnp.sin(flash_mha(q, k, v, heads)))

    with force_tpu_interpret_mode():
        o_pre = flash_mha(padded(q), padded(k), padded(v), heads, pre_padded=L)
        o_std = flash_mha(q, k, v, heads)
        g_pre = jax.grad(loss_pre, argnums=(0, 1, 2))(q, k, v)
        g_std = jax.grad(loss_percall, argnums=(0, 1, 2))(q, k, v)
    assert o_pre.shape == (1, lp, heads * hd)  # padded length kept
    np.testing.assert_allclose(
        np.asarray(o_pre[:, :L]), np.asarray(o_std), atol=2e-5, rtol=0
    )
    for a, b in zip(g_pre, g_std):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=0)


def test_qualifies_accepts_bucket_lengths(monkeypatch):
    import sd_lora_trainer_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_on_tpu", lambda: True)
    assert fa.flash_attention_qualifies((8, 3952, 640), (8, 3952, 640), 10)
    assert fa.flash_attention_qualifies((8, 4032, 320), (8, 4032, 320), 8)
    assert not fa.flash_attention_qualifies((8, 100, 640), (8, 100, 640), 10)
    # cross-attention (77 kv tokens) still einsum
    assert not fa.flash_attention_qualifies((8, 4096, 640), (8, 77, 640), 10)
