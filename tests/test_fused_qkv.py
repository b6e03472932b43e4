"""Fused qkv/kv projection layout (models/fuse.py) must be numerically
identical to the unfused forward — with and without LoRA adapters grafted —
and through the FULL jitted train step (losses, adapter updates, optimizer
moments: the path the `fuse_qkv` config default actually ships)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.models.fuse import fuse_attention_projections
from sd_lora_trainer_tpu.models.lora import UNET_TARGETS, create_lora_params, inject_lora
from sd_lora_trainer_tpu.models.unet import (
    TINY_SDXL_UNET_CONFIG,
    init_unet_params,
    unet_forward,
)


def _inputs(cfg, key):
    kl, kc = jax.random.split(key)
    latents = jax.random.normal(kl, (2, 16, 16, 4), jnp.float32)
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jax.random.normal(kc, (2, 77, cfg.cross_attention_dim), jnp.float32)
    added = {
        "text_embeds": jnp.zeros((2, cfg.addition_pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[64, 64, 0, 0, 16, 16]], jnp.float32), (2, 1)),
    }
    return latents, t, ctx, added


def test_fused_forward_matches_unfused():
    cfg = TINY_SDXL_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    latents, t, ctx, added = _inputs(cfg, jax.random.PRNGKey(1))

    ref, _ = jax.jit(
        lambda p: unet_forward(p, latents, t, ctx, cfg, added_cond=added,
                               use_flash=False, remat=False)
    )(params)
    fused, _ = jax.jit(
        lambda p: unet_forward(p, latents, t, ctx, cfg, added_cond=added,
                               use_flash=False, remat=False)
    )(fuse_attention_projections(params))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), rtol=2e-5, atol=2e-5)


def test_fused_forward_with_lora_matches_and_grads_flow():
    cfg = TINY_SDXL_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = create_lora_params(jax.random.PRNGKey(2), params, rank=4, targets=UNET_TARGETS)
    # nonzero B so the LoRA delta actually contributes
    lora = jax.tree.map(
        lambda x: x + 0.01 if hasattr(x, "ndim") and x.ndim == 2 else x, lora
    )
    latents, t, ctx, added = _inputs(cfg, jax.random.PRNGKey(3))
    fused_base = fuse_attention_projections(params)

    def fwd(base, adapters):
        out, _ = unet_forward(
            inject_lora(base, adapters), latents, t, ctx, cfg,
            added_cond=added, use_flash=False, remat=False,
        )
        return out

    ref = jax.jit(fwd)(params, lora)
    fused = jax.jit(fwd)(fused_base, lora)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), rtol=2e-5, atol=2e-5)

    # gradients w.r.t. the adapters must match across layouts
    g_ref = jax.jit(jax.grad(lambda a: jnp.sum(fwd(params, a) ** 2)))(lora)
    g_fused = jax.jit(jax.grad(lambda a: jnp.sum(fwd(fused_base, a) ** 2)))(lora)
    for (pa, ga), (pb, gb) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )
    # and the attn1/attn2 adapter grads are nonzero (the fused path really
    # routes gradients through the split slices)
    nonzero = [
        jax.tree_util.keystr(p)
        for p, g in jax.tree_util.tree_flatten_with_path(g_fused)[0]
        if "to_q" in jax.tree_util.keystr(p) and np.abs(np.asarray(g)).sum() > 0
    ]
    assert nonzero


def test_fused_train_step_matches_unfused():
    """Multi-step equivalence through the REAL jitted train step: same
    losses and same updated trainable tree whether the frozen UNet uses the
    fused or the unfused layout."""
    from tests.test_train_step import _batch, _cfg, _trainable, make_tiny_frozen
    from sd_lora_trainer_tpu.training.optimizers import build_optimizer
    from sd_lora_trainer_tpu.training.step import StepConfig, TrainState, make_train_step

    frozen = make_tiny_frozen()
    config = _cfg()
    sc = dataclasses.replace(StepConfig.from_config(config, 1.0), use_flash=False)
    trainable = _trainable(frozen, config, jax.random.PRNGKey(1))
    optimizer = build_optimizer(config, trainable)
    batch = _batch()

    def run(fz):
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=jax.tree.map(jnp.copy, trainable),
            opt_state=optimizer.init(trainable),
            key=jax.random.PRNGKey(3),
        )
        step_fn = jax.jit(make_train_step(sc, optimizer))
        losses = []
        for _ in range(3):
            state, metrics = step_fn(state, batch, fz)
            losses.append(float(metrics["tot_loss"]))
        return state, losses

    frozen_fused = dataclasses.replace(
        frozen, unet_params=fuse_attention_projections(frozen.unet_params)
    )
    s_ref, l_ref = run(frozen)
    s_fused, l_fused = run(frozen_fused)
    np.testing.assert_allclose(l_ref, l_fused, rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_ref.trainable)[0],
        jax.tree_util.tree_flatten_with_path(s_fused.trainable)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )