"""Optimizer tests: Prodigy behavior, LR schedules, multi-group transform."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.training.optimizers import (
    base_unet_lr,
    build_optimizer,
    te_lora_lr_schedule,
    ti_lr_schedule,
    unet_lr_schedule,
)
from sd_lora_trainer_tpu.training.prodigy import prodigy, prodigy_effective_lr


def _cfg(**kw):
    base = dict(
        lora_training_urls="x", concept_mode="style", sd_model_version="sd15",
        max_train_steps=100, _testing_no_output_dir=True,
    )
    base.update(kw)
    return TrainingConfig(**base)


def test_prodigy_converges_on_quadratic():
    """Prodigy must find a good step size from d0=1e-6 and drive a quadratic
    to its minimum without any manual LR."""
    target = jnp.asarray([3.0, -2.0, 0.5, 7.0])
    params = jnp.zeros(4)
    opt = prodigy(growth_rate=1.05)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = 2 * (params - target)  # grad of ||p - t||^2
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(300):
        params, state = step(params, state)
    # D-adaptation oscillates in a small neighborhood of the optimum on a
    # deterministic quadratic; assert it got there from ||target|| ~ 7.9 away
    err = float(jnp.linalg.norm(params - target))
    assert err < 0.8, err
    assert float(state.d) > 1e-4  # d grew far beyond d0


def test_prodigy_growth_rate_caps_d():
    target = jnp.asarray([100.0])
    params = jnp.zeros(1)
    slow = prodigy(growth_rate=1.01)
    fast = prodigy(growth_rate=1.5)
    s_slow, s_fast = slow.init(params), fast.init(params)
    p_slow = p_fast = params
    for _ in range(30):
        g = 2 * (p_slow - target)
        u, s_slow = slow.update(g, s_slow, p_slow)
        p_slow = optax.apply_updates(p_slow, u)
        g = 2 * (p_fast - target)
        u, s_fast = fast.update(g, s_fast, p_fast)
        p_fast = optax.apply_updates(p_fast, u)
    assert float(s_fast.d) > float(s_slow.d)


def test_prodigy_effective_lr_positive_and_tracks_d():
    params = jnp.zeros(3)
    opt = prodigy()
    state = opt.init(params)
    lr0 = float(prodigy_effective_lr(state))
    for _ in range(5):
        g = jnp.ones(3)
        u, state = opt.update(g, state, params)
        params = optax.apply_updates(params, u)
    assert float(prodigy_effective_lr(state)) > 0


def test_ti_schedule_decay_and_freeze():
    cfg = _cfg(ti_lr=0.001, freeze_ti_after_completion_f=0.7)
    sched = ti_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 0.001, rtol=1e-6)
    mid = float(sched(jnp.asarray(50)))
    assert 0 < mid < 0.001
    np.testing.assert_allclose(mid, 0.001 * (1 - 0.5) ** 1.7, rtol=1e-5)
    assert float(sched(jnp.asarray(80))) == 0.0  # past freeze point


def test_unet_schedule_exponential_ramp():
    cfg = _cfg(unet_lr=3e-4)
    sched = unet_lr_schedule(cfg)
    base = base_unet_lr(cfg)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), base, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(100))), 3e-4, rtol=1e-5)
    # monotone ramp
    lrs = [float(sched(jnp.asarray(s))) for s in range(0, 101, 20)]
    assert all(b >= a for a, b in zip(lrs, lrs[1:]))


def test_base_unet_lr_variants():
    assert base_unet_lr(_cfg(is_lora=True, disable_ti=True)) == 2.0e-4
    assert base_unet_lr(_cfg(is_lora=True, disable_ti=False)) == 5.0e-5
    assert base_unet_lr(_cfg(is_lora=False)) == 1.0e-5


def test_te_lora_schedule_warmup():
    cfg = _cfg(text_encoder_lora_lr=1e-5, txt_encoders_lr_warmup_steps=20)
    sched = te_lora_lr_schedule(cfg)
    assert float(sched(jnp.asarray(0))) == 0.0
    assert float(sched(jnp.asarray(10))) < float(sched(jnp.asarray(20)))


def test_multi_transform_updates_only_matching_groups():
    cfg = _cfg()
    trainable = {
        "unet": {"m": jnp.ones((4, 4))},
        "ti": {"te1": jnp.ones((3, 8))},
    }
    opt = build_optimizer(cfg, trainable)
    state = opt.init(trainable)
    grads = jax.tree.map(jnp.ones_like, trainable)
    updates, state = opt.update(grads, state, trainable)
    new = optax.apply_updates(trainable, updates)
    assert not np.allclose(np.asarray(new["unet"]["m"]), 1.0)
    assert not np.allclose(np.asarray(new["ti"]["te1"]), 1.0)
