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


def test_dynamic_map_matches_bitsandbytes_golden():
    """The codebooks are bitsandbytes' exact create_dynamic_map output
    (signed for m, unsigned for v), pinned in tests/golden/bnb_dynamic_map.json
    — quantized states interchange bit-for-bit with bnb's AdamW8bit."""
    import json
    import os

    from sd_lora_trainer_tpu.training.quantized_adam import _SMAP, _SZERO, _UMAP, _UZERO

    golden = json.load(
        open(os.path.join(os.path.dirname(__file__), "golden", "bnb_dynamic_map.json"))
    )
    s = np.asarray(_SMAP, np.float64)
    u = np.asarray(_UMAP, np.float64)
    np.testing.assert_allclose(s, np.asarray(golden["signed"]), rtol=0, atol=0)
    np.testing.assert_allclose(u, np.asarray(golden["unsigned"]), rtol=0, atol=0)

    # structural facts of bnb's dynamic datatype (8-bit, 7 exponent decades)
    assert s.size == 256 and u.size == 256
    assert s[_SZERO] == 0.0 and u[_UZERO] == 0.0
    assert s[-1] == 1.0 and u[-1] == 1.0
    # smallest positive magnitude: 10^-6 * mean(linspace(0.1, 1, 2)) = 5.5e-7
    assert np.isclose(s[s > 0].min(), 5.5e-7)
    # per-decade population: 2^i signed values in decade i (i=0..6)
    for i in range(7):
        lo, hi = 10.0 ** (-6 + i - 1), 10.0 ** (-6 + i)
        n = int(((s > lo) & (s <= hi)).sum())
        assert n == 2**i + (1 if i == 6 else 0), (i, n)  # decade 6 includes 1.0
    assert np.all(np.diff(s) > 0) and np.all(np.diff(u) >= 0)
