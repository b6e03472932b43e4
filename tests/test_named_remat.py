"""Named-activation remat: save/offload policies over checkpoint_name tags.

Validates the two assumptions the "save:.../offload:..." remat modes
(models/unet.py) rest on:
1. `checkpoint_name` annotations inside a custom_vjp's fwd are visible to
   remat policies (this is how flash_attention._named_flash exposes the
   kernel's softmax residuals for saving);
2. saving a named intermediate actually elides its producer's recompute in
   the backward pass (counted as dot_general ops in the grad jaxpr);
and that the named modes are numerically identical to full remat through the
real UNet.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.ad_checkpoint import checkpoint_name


def _count_eqn(jaxpr, prim_name):
    def as_jaxpr(v):
        # params hold either ClosedJaxpr (has .jaxpr) or plain Jaxpr (has .eqns)
        if hasattr(v, "jaxpr"):
            return v.jaxpr
        if hasattr(v, "eqns"):
            return v
        return None

    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == prim_name:
            n += 1
        for v in eqn.params.values():
            for item in v if isinstance(v, (list, tuple)) else (v,):
                inner = as_jaxpr(item)
                if inner is not None:
                    n += _count_eqn(inner, prim_name)
    return n


def test_names_inside_custom_vjp_fwd_are_saveable():
    """A policy that saves a custom_vjp's named residual must elide the
    residual-producing matmul's recompute in backward."""
    W1 = jnp.ones((16, 16))

    @jax.custom_vjp
    def expensive(x):
        return jnp.tanh(x @ W1)

    def fwd(x):
        h = checkpoint_name(x @ W1, "hidden")
        return jnp.tanh(h), (h,)

    def bwd(res, g):
        (h,) = res
        return (((1 - jnp.tanh(h) ** 2) * g) @ W1.T,)

    expensive.defvjp(fwd, bwd)

    def loss(x):
        return jnp.sum(expensive(x) ** 2)

    def grad_with(policy):
        f = jax.checkpoint(loss, policy=policy)
        return jax.make_jaxpr(jax.grad(f))(jnp.ones((16, 16)))

    n_full = _count_eqn(
        grad_with(jax.checkpoint_policies.nothing_saveable).jaxpr, "dot_general"
    )
    n_saved = _count_eqn(
        grad_with(jax.checkpoint_policies.save_only_these_names("hidden")).jaxpr,
        "dot_general",
    )
    # full remat recomputes x@W1 in backward; saving "hidden" skips it
    assert n_saved < n_full, (n_saved, n_full)


def _tiny_setup():
    from sd_lora_trainer_tpu.models.unet import (
        TINY_SDXL_UNET_CONFIG,
        init_unet_params,
        unet_forward,
    )

    cfg = TINY_SDXL_UNET_CONFIG
    key = jax.random.PRNGKey(0)
    params = init_unet_params(key, cfg, dtype=jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, cfg.cross_attention_dim))
    t = jnp.asarray([3, 7])
    added = {
        "text_embeds": jnp.zeros((2, cfg.addition_pooled_dim)),
        "time_ids": jnp.zeros((2, 6)),
    }
    return cfg, params, lat, t, ctx, added


@pytest.mark.parametrize(
    "mode",
    [
        "save:ff_hidden*",
        "save:attn_out*,ff_hidden*",
        "light+save:attn_out*",
        "save:xattn_out*",  # cross-attention outputs (distinct from self)
    ],
)
def test_named_save_matches_full_remat(mode):
    cfg, params, lat, t, ctx, added = _tiny_setup()
    from sd_lora_trainer_tpu.models.unet import unet_forward

    def loss(params, remat):
        out, _ = unet_forward(
            params, lat, t, ctx, cfg, added_cond=added, use_flash=False, remat=remat
        )
        return jnp.sum(out**2)

    g_full = jax.grad(lambda p: loss(p, True))(params)
    g_named = jax.grad(lambda p: loss(p, mode))(params)
    # tolerances absorb XLA reassociation noise between the rematted and
    # saved computation orders (measured ~3e-6 relative on light+save)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_named)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=3e-5)


def test_named_save_elides_recompute():
    """save:ff_hidden* must strictly reduce backward-pass matmul count vs
    full remat (the GEGLU up-projection is no longer recomputed)."""
    cfg, params, lat, t, ctx, added = _tiny_setup()
    from sd_lora_trainer_tpu.models.unet import unet_forward

    def loss(params, remat):
        out, _ = unet_forward(
            params, lat, t, ctx, cfg, added_cond=added, use_flash=False, remat=remat
        )
        return jnp.sum(out**2)

    n_full = _count_eqn(
        jax.make_jaxpr(jax.grad(lambda p: loss(p, True)))(params).jaxpr, "dot_general"
    )
    n_named = _count_eqn(
        jax.make_jaxpr(jax.grad(lambda p: loss(p, "save:attn_out*,ff_hidden*")))(
            params
        ).jaxpr,
        "dot_general",
    )
    assert n_named < n_full, (n_named, n_full)
