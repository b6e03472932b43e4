"""Module-level sequence padding for aspect-ratio bucket shapes.

models/unet.py pads each spatial transformer ONCE to the flash pad plan and
runs every block at the padded length (instead of the per-attention-call
pad/slice pairs that serialized ~500 x 40 MB DMAs per step — see the ragged
832x1216 profile in bench_logs/r5_session.log). These tests pin the claim
that padding is EXACT: forward outputs, captured DAAM scores, and gradients
(params and latents) must match the unpadded forward bit-for-bit-ish.

On CPU the flash kernel doesn't qualify, so the padded blocks exercise the
einsum fallback with the additive pad-key mask (ops/attention.py) — the
masking logic itself; the flash segment-id path is pinned separately in
tests/test_flash_padded.py::test_flash_mha_pre_padded_matches_per_call_pad.
"""

import jax
import jax.numpy as jnp
import numpy as np

import sd_lora_trainer_tpu.models.unet as unet_mod
from sd_lora_trainer_tpu.models.unet import (
    TINY_SDXL_UNET_CONFIG,
    init_unet_params,
    unet_forward,
)


def _inputs(cfg, key, h=16, w=20):
    kl, kc = jax.random.split(key)
    latents = jax.random.normal(kl, (2, h, w, 4), jnp.float32)
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jax.random.normal(kc, (2, 77, cfg.cross_attention_dim), jnp.float32)
    added = {
        "text_embeds": jnp.zeros((2, cfg.addition_pooled_dim), jnp.float32),
        "time_ids": jnp.tile(
            jnp.asarray([[64, 64, 0, 0, 16, 16]], jnp.float32), (2, 1)
        ),
    }
    return latents, t, ctx, added


def _forced_pad_len(b, ntok, c, heads, use_flash):
    """Engage module padding on CPU (the real gate requires the TPU kernel):
    pad the two largest levels of the tiny SDXL UNet to the ragged plan."""
    from sd_lora_trainer_tpu.ops.flash_attention import _pad_plan

    if not use_flash or ntok < 64:
        return 0
    lp = _pad_plan(ntok)[0] if ntok % 128 else ntok + 128  # force raggedness
    return lp if lp != ntok else 0


def test_module_padded_forward_scores_and_grads_match_unpadded(monkeypatch):
    cfg = TINY_SDXL_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # non-square latents: 16x20 -> ntok 320/80/20 per level (ragged bucket)
    latents, t, ctx, added = _inputs(cfg, jax.random.PRNGKey(1))

    def fwd(p, lat):
        out, scores = unet_forward(
            p, lat, t, ctx, cfg, added_cond=added, capture_attn=True,
            use_flash=True, remat=False,
        )
        return out, scores

    ref_out, ref_scores = jax.jit(fwd)(params, latents)  # _module_pad_len -> 0 on CPU
    assert ref_scores, "DAAM capture produced no scores"

    monkeypatch.setattr(unet_mod, "_module_pad_len", _forced_pad_len)
    pad_out, pad_scores = jax.jit(fwd)(params, latents)

    np.testing.assert_allclose(
        np.asarray(pad_out), np.asarray(ref_out), atol=2e-5, rtol=0
    )
    assert set(pad_scores) == set(ref_scores)
    for name in ref_scores:
        assert pad_scores[name].shape == ref_scores[name].shape, name
        np.testing.assert_allclose(
            np.asarray(pad_scores[name]), np.asarray(ref_scores[name]),
            atol=5e-4, rtol=0,
        )

    def loss(p, lat):
        out, _ = unet_forward(
            p, lat, t, ctx, cfg, added_cond=added, use_flash=True, remat=False
        )
        return jnp.sum(jnp.sin(out))

    monkeypatch.setattr(
        unet_mod, "_module_pad_len", lambda *a: 0
    )
    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, latents)
    monkeypatch.setattr(unet_mod, "_module_pad_len", _forced_pad_len)
    g_pad = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, latents)

    ref_leaves, pad_leaves = jax.tree.leaves(g_ref), jax.tree.leaves(g_pad)
    assert len(ref_leaves) == len(pad_leaves)
    for a, b in zip(ref_leaves, pad_leaves):
        # padded reductions reassociate the fp32 sums (64 extra zero rows in
        # the dW matmuls): identical math, ~1e-6 relative float noise
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=1e-4
        )


def test_module_padded_forward_under_remat(monkeypatch):
    """The padded module must compose with the block-remat path (the product
    always trains with some remat plan at SDXL sizes)."""
    cfg = TINY_SDXL_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    latents, t, ctx, added = _inputs(cfg, jax.random.PRNGKey(1))

    def loss(p, lat, remat):
        out, _ = unet_forward(
            p, lat, t, ctx, cfg, added_cond=added, use_flash=True, remat=remat
        )
        return jnp.sum(jnp.sin(out))

    monkeypatch.setattr(unet_mod, "_module_pad_len", _forced_pad_len)
    l_full = jax.jit(lambda p, x: loss(p, x, True))(params, latents)
    g = jax.jit(jax.grad(lambda p, x: loss(p, x, True)))(params, latents)
    l_off = jax.jit(lambda p, x: loss(p, x, False))(params, latents)
    np.testing.assert_allclose(float(l_full), float(l_off), atol=2e-5, rtol=0)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
