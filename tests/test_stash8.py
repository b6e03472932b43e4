"""int8 activation stashing (ops/stash8.py) under named-remat save plans.

Covers: rowwise quantizer error bound + straight-through gradient; that a
save: policy keeps the int8 pair INSTEAD of the bf16 tensor (memory claim,
checked as saved-residual bytes in the jitted grad); and end-to-end grad
closeness + recompute elision through the real UNet.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_named_remat import _count_eqn, _tiny_setup


def test_quantizer_roundtrip_bound():
    from sd_lora_trainer_tpu.ops.stash8 import dequantize_rowwise, quantize_rowwise

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 320)) * jnp.exp(
        jax.random.normal(jax.random.PRNGKey(1), (4, 64, 1))  # varied row scales
    )
    q, s = quantize_rowwise(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 64, 1)
    xr = dequantize_rowwise(q, s, x.dtype)
    # error per element <= scale/2 = rowmax/254
    rowmax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(xr - x)) <= rowmax / 254 + 1e-7).all()


def test_stash8_straight_through_gradient():
    from sd_lora_trainer_tpu.ops.stash8 import stash8

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
    g = jax.grad(lambda x: jnp.sum(jnp.sin(stash8(x, "t"))))(x)
    # STE: d stash8/dx == I, so the grad equals cos at the DEQUANTIZED point
    xq = stash8(x, "t")
    np.testing.assert_allclose(np.asarray(g), np.cos(np.asarray(xq)), atol=1e-6)


def test_stash8_requires_save_plan():
    cfg, params, lat, t, ctx, added = _tiny_setup()
    from sd_lora_trainer_tpu.models.unet import unet_forward

    with pytest.raises(ValueError, match="save"):
        unet_forward(
            params, lat, t, ctx, cfg, added_cond=added, use_flash=False,
            remat=True, stash8="ff_hidden*",
        )


def _grad_fn(cfg, params, lat, t, ctx, added, remat, stash8=""):
    from sd_lora_trainer_tpu.models.unet import unet_forward

    def loss(p):
        out, _ = unet_forward(
            p, lat, t, ctx, cfg, added_cond=added, use_flash=False,
            remat=remat, stash8=stash8,
        )
        return jnp.sum(out**2)

    return loss


def test_stash8_grads_close_to_bf16_save():
    """Same save plan with/without the int8 stash: grads must agree to the
    quantization-noise level (the ONLY difference is the stash precision)."""
    cfg, params, lat, t, ctx, added = _tiny_setup()
    plan = "save:attn_out*,xattn_out*,ff_hidden*"
    g_ref = jax.grad(_grad_fn(cfg, params, lat, t, ctx, added, plan))(params)
    g_q = jax.grad(
        _grad_fn(
            cfg, params, lat, t, ctx, added, plan,
            stash8="attn_out*,xattn_out*,ff_hidden*",
        )
    )(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_q)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        # int8 rowwise stash: observed ~1e-3 relative on the tiny UNet
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=2e-2)


def test_stash8_saves_int8_not_bf16():
    """The saved residual for a stashed name must be int8: the grad jaxpr
    under save:ff_hidden* + stash8 contains convert_element_type to int8
    feeding the checkpoint boundary, and elides the same recompute the bf16
    save does."""
    cfg, params, lat, t, ctx, added = _tiny_setup()
    plan = "save:attn_out*,ff_hidden*"
    jaxpr_q = jax.make_jaxpr(
        jax.grad(_grad_fn(cfg, params, lat, t, ctx, added, plan, "attn_out*,ff_hidden*"))
    )(params)
    jaxpr_full = jax.make_jaxpr(
        jax.grad(_grad_fn(cfg, params, lat, t, ctx, added, True))
    )(params)
    # recompute elision holds with the int8 stash too
    assert _count_eqn(jaxpr_q.jaxpr, "dot_general") < _count_eqn(
        jaxpr_full.jaxpr, "dot_general"
    )
    # and int8 tensors actually exist in the stashed computation
    found_int8 = False
    def scan(jx):
        nonlocal found_int8
        for eqn in jx.eqns:
            for v in eqn.outvars:
                if getattr(v.aval, "dtype", None) == jnp.int8:
                    found_int8 = True
            for p in eqn.params.values():
                for item in p if isinstance(p, (list, tuple)) else (p,):
                    inner = getattr(item, "jaxpr", item if hasattr(item, "eqns") else None)
                    if inner is not None:
                        scan(inner)
    scan(jaxpr_q.jaxpr)
    assert found_int8


def test_stash8_through_jitted_train_step():
    """The full jitted train step runs with a stash8 plan and produces a loss
    close to the bf16-save run (same data, same RNG)."""
    import dataclasses

    from sd_lora_trainer_tpu.training.optimizers import build_optimizer
    from sd_lora_trainer_tpu.training.step import StepConfig, TrainState, make_train_step
    from tests.test_train_step import _batch, _cfg, _trainable, make_tiny_frozen

    frozen = make_tiny_frozen()
    config = _cfg()
    plan = "save:attn_out*,ff_hidden*"
    sc = dataclasses.replace(
        StepConfig.from_config(config, 1.0), use_flash=False, remat=plan
    )
    trainable = _trainable(frozen, config, jax.random.PRNGKey(1))
    optimizer = build_optimizer(config, trainable)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        key=jax.random.PRNGKey(3),
    )
    batch = _batch()
    _, m_ref = jax.jit(make_train_step(sc, optimizer))(state, batch, frozen)
    sc_q = dataclasses.replace(sc, stash8="attn_out*,ff_hidden*")
    _, m_q = jax.jit(make_train_step(sc_q, optimizer))(state, batch, frozen)
    ref, q = float(m_ref["img_loss"]), float(m_q["img_loss"])
    assert np.isfinite(q)
    assert abs(ref - q) / max(abs(ref), 1e-6) < 5e-2, (ref, q)

    # multi-step drift: 30 optimizer steps on the fixed batch must track the
    # bf16-save trajectory (both overfit; int8 noise must not change the
    # training dynamics, only perturb individual losses slightly)
    traj = {}
    for name, cfg_sc in (("ref", sc), ("q8", sc_q)):
        st = state
        fn = jax.jit(make_train_step(cfg_sc, optimizer))
        ls = []
        for _ in range(30):
            st, m = fn(st, batch, frozen)
            ls.append(float(m["img_loss"]))
        traj[name] = ls
    # same overfitting shape: late-window means within 5%
    late_ref = np.mean(traj["ref"][-10:])
    late_q = np.mean(traj["q8"][-10:])
    assert abs(late_ref - late_q) / max(abs(late_ref), 1e-6) < 5e-2, (late_ref, late_q)
    assert late_q < np.mean(traj["q8"][:5]), traj["q8"]  # it actually learns
