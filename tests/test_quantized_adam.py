"""AdamW8bit (block-wise int8 moments) tests: quantization roundtrip accuracy
and optimization parity with full-precision AdamW."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd_lora_trainer_tpu.training.quantized_adam import (
    BLOCK,
    adamw8bit,
    dequantize_blockwise,
    quantize_blockwise,
)


def test_quantize_roundtrip_error_bounded():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 1000)) * 0.01
    q, scale = quantize_blockwise(x, signed=True)
    back = dequantize_blockwise(q, scale, x.shape, signed=True)
    # geometric codebook: relative error bounded by the ramp step (~6.5%)
    rel = np.abs(np.asarray(back - x)) / (np.abs(np.asarray(x)) + 1e-7 * float(jnp.abs(x).max()))
    assert np.median(rel) < 0.08


def test_quantize_unsigned_for_nonnegative():
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (BLOCK * 2,))) * 1e-4
    q, scale = quantize_blockwise(x, signed=False)
    back = dequantize_blockwise(q, scale, x.shape, signed=False)
    assert float(back.min()) >= 0
    rel = np.abs(np.asarray(back - x)) / (np.abs(np.asarray(x)) + 1e-7 * float(x.max()))
    assert np.median(rel) < 0.08


def test_adamw8bit_tracks_adamw():
    """On a quadratic, int8-state AdamW should land near full AdamW."""
    target = jax.random.normal(jax.random.PRNGKey(2), (4096,))
    lr = 0.05

    def run(opt):
        params = jnp.zeros_like(target)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            grads = 2 * (params - target)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state

        for _ in range(200):
            params, state = step(params, state)
        return params

    p8 = run(adamw8bit(lr))
    pf = run(optax.adamw(lr, weight_decay=0.0))
    err8 = float(jnp.linalg.norm(p8 - target))
    errf = float(jnp.linalg.norm(pf - target))
    # both should converge to a small neighborhood; int8 within 2x of fp32
    assert errf < 5.0
    assert err8 < max(2 * errf, 1.0), (err8, errf)


def test_adamw8bit_state_memory_is_int8():
    params = {"w": jnp.zeros((4096, 64))}
    opt = adamw8bit(1e-3)
    state = opt.init(params)
    assert state.mu["w"].q.dtype == jnp.uint8
    assert state.nu["w"].q.dtype == jnp.uint8
    # scales are tiny relative to the moment payload
    assert state.mu["w"].scale.size * 4 < state.mu["w"].q.size // 100
