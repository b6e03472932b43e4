"""Prodigy optimizer (arXiv:2306.06101) as an optax transform.

The reference depends on the prodigyopt package with very specific knobs
(trainer/optimizer.py:22-34: d_coef, growth_rate, safeguard_warmup=True,
decouple=True, use_bias_correction=True, betas=(0.9, 0.99)) and introspects
the adapted step size for LR plots (trainer/optimizer.py:206-234). optax's
contrib.prodigy lacks the growth_rate knob, so this is a faithful port of the
prodigyopt update rule with all four knobs, plus `effective_lr()` for the
LR-tracking parity.

All state lives on device; the whole update is jit-compatible (scalars are
0-d arrays, no python branching on traced values).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree
    s: chex.ArrayTree
    p0: chex.ArrayTree  # initial params
    d: jnp.ndarray  # current estimate of D
    d_max: jnp.ndarray
    d_numerator: jnp.ndarray
    count: jnp.ndarray  # k


def prodigy(
    learning_rate=1.0,
    betas=(0.9, 0.99),
    beta3: Optional[float] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    d_coef: float = 1.0,
    d0: float = 1e-6,
    growth_rate: float = float("inf"),
    safeguard_warmup: bool = True,
    use_bias_correction: bool = True,
    decouple: bool = True,
) -> optax.GradientTransformation:
    beta1, beta2 = betas
    beta3_val = beta3 if beta3 is not None else beta2**0.5

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return ProdigyState(
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            s=zeros,
            p0=jax.tree.map(lambda p: p.astype(jnp.float32), params),
            d=jnp.asarray(d0, jnp.float32),
            d_max=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.asarray(0.0, jnp.float32),
            count=jnp.asarray(0, jnp.int32),
        )

    def update_fn(grads, state, params):
        assert params is not None, "prodigy needs params (pass them to update)"
        k = state.count
        lr = learning_rate(k) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)
        d = state.d

        if use_bias_correction:
            bias_correction = jnp.sqrt(1.0 - beta2 ** (k.astype(jnp.float32) + 1.0)) / (
                1.0 - beta1 ** (k.astype(jnp.float32) + 1.0)
            )
        else:
            bias_correction = jnp.asarray(1.0, jnp.float32)
        dlr = d * lr * bias_correction

        # numerator: beta3-decayed accumulation of (d/d0)*dlr*<g, p0 - p>
        dot = sum(
            jnp.sum(g.astype(jnp.float32) * (p0 - p.astype(jnp.float32)))
            for g, p0, p in zip(
                jax.tree.leaves(grads), jax.tree.leaves(state.p0), jax.tree.leaves(params)
            )
        )
        d_numerator = state.d_numerator * beta3_val + (d / d0) * dlr * dot

        exp_avg = jax.tree.map(
            lambda m, g: m * beta1 + d * (1 - beta1) * g.astype(jnp.float32),
            state.exp_avg,
            grads,
        )
        exp_avg_sq = jax.tree.map(
            lambda v, g: v * beta2 + d * d * (1 - beta2) * jnp.square(g.astype(jnp.float32)),
            state.exp_avg_sq,
            grads,
        )
        s_coef = (d / d0) * jnp.where(safeguard_warmup, d, dlr)
        s = jax.tree.map(
            lambda s_, g: s_ * beta3_val + s_coef * g.astype(jnp.float32), state.s, grads
        )
        d_denom = sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(s))

        d_hat = d_coef * d_numerator / jnp.maximum(d_denom, 1e-30)
        # while still at d0 take the max with d_hat immediately; afterwards
        # grow at most by growth_rate per step
        d_new = jnp.where(state.d == d0, jnp.maximum(d, d_hat), d)
        d_max = jnp.maximum(state.d_max, d_hat)
        d_new = jnp.minimum(d_max, d_new * growth_rate)
        d_new = jnp.maximum(d_new, d)  # d never shrinks in prodigyopt

        # prodigyopt applies the step with dlr from the *old* d but the
        # epsilon guard from the *new* d
        def leaf_update(p, m, v):
            denom = jnp.sqrt(v) + d_new * eps
            step = -dlr * m / denom
            if decouple and weight_decay > 0.0:
                step = step - weight_decay * dlr * p.astype(jnp.float32)
            return step.astype(p.dtype)

        updates = jax.tree.map(leaf_update, params, exp_avg, exp_avg_sq)

        new_state = ProdigyState(
            exp_avg=exp_avg,
            exp_avg_sq=exp_avg_sq,
            s=s,
            p0=state.p0,
            d=d_new,
            d_max=d_max,
            d_numerator=d_numerator,
            count=k + 1,
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def prodigy_effective_lr(state: ProdigyState, learning_rate=1.0, betas=(0.9, 0.99)) -> jnp.ndarray:
    """d * lr * bias_correction — what the reference logs per step
    (trainer/optimizer.py:206-234)."""
    beta1, beta2 = betas
    k = state.count.astype(jnp.float32)
    bc = jnp.sqrt(1.0 - beta2 ** (k + 1.0)) / (1.0 - beta1 ** (k + 1.0))
    lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
    return state.d * lr * bc
