"""shard_map-over-heads attention under tensor parallelism
(ops/attention.py `tp_shard`).

On CPU the inner kernel is the einsum path (flash needs a TPU — its numerics
are pinned by tests/test_flash_tpu.py on-chip); what this pins in CI is the
sharding semantics: splitting the head axis across the 'model' mesh axis and
the batch across 'data' must be numerically identical to unsharded attention,
and indivisible head counts must fall back cleanly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_lora_trainer_tpu.ops.attention import multihead_attention, self_attention
from sd_lora_trainer_tpu.parallel.sharding import create_mesh_2d


@pytest.mark.parametrize("heads", [2, 4])
def test_shardmap_attention_matches_unsharded(eight_cpu_devices, heads):
    mesh = create_mesh_2d(4, 2)
    b, l, d = 4, 64, 8 * heads
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, l, d), jnp.float32)
    k = jax.random.normal(kk, (b, l, d), jnp.float32)
    v = jax.random.normal(kv, (b, l, d), jnp.float32)

    ref, _ = multihead_attention(q, k, v, heads)
    out = jax.jit(
        lambda q, k, v: self_attention(
            q, k, v, heads, use_flash=True, tp_shard=(mesh, "data", "model")
        )
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_indivisible_heads_fall_back(eight_cpu_devices):
    """heads=1 cannot split across model=2: must take the plain path."""
    mesh = create_mesh_2d(4, 2)
    q = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 16), jnp.float32)
    ref, _ = multihead_attention(q, q, q, 1)
    out = self_attention(q, q, q, 1, use_flash=True, tp_shard=(mesh, "data", "model"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_indivisible_batch_falls_back(eight_cpu_devices):
    """batch=3 doesn't divide data=4: must take the plain path."""
    mesh = create_mesh_2d(4, 2)
    q = jax.random.normal(jax.random.PRNGKey(2), (3, 32, 16), jnp.float32)
    ref, _ = multihead_attention(q, q, q, 2)
    out = self_attention(q, q, q, 2, use_flash=True, tp_shard=(mesh, "data", "model"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
