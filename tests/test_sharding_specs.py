"""Structural optimizer-state sharding (parallel/sharding.py).

Pins the fix for shape-coincidence mis-sharding: a replicated-group leaf (TI
row) that shares its shape with an fsdp-sharded unet param must still get
replicated optimizer moments — group membership is recovered from tree
position, not shape equality."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from sd_lora_trainer_tpu.parallel.sharding import (
    create_mesh,
    optimizer_state_shardings,
    trainable_shardings,
)


def _named_specs(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {tuple(str(k) for k in path): sh.spec for path, sh in leaves}


def test_moments_follow_param_group_not_shape(eight_cpu_devices):
    mesh = create_mesh(8)
    # the TI row deliberately shares its shape with the unet kernel
    trainable = {
        "unet": {"blk": {"kernel": jnp.zeros((16, 8)), "bias": jnp.zeros((8,))}},
        "ti": {"te1": jnp.zeros((16, 8))},
    }
    t_sh = trainable_shardings(trainable, mesh, mode="fsdp")
    opt = optax.multi_transform(
        {"unet": optax.adam(1e-3), "ti": optax.adam(1e-2)},
        lambda tree: {k: jax.tree.map(lambda _: k, v) for k, v in tree.items()},
    )
    opt_state = opt.init(trainable)
    opt_sh = optimizer_state_shardings(opt_state, trainable, t_sh, mesh)

    unet_kernel_spec = None
    for path, spec in _named_specs(opt_sh).items():
        if "'te1'" in str(path) and "'ti'" in str(path):
            assert spec == P(), f"TI moment must replicate, got {spec} at {path}"
        if "'kernel'" in str(path) and "'blk'" in str(path):
            unet_kernel_spec = spec
    # the unet kernel's moments do shard (16 divides the 8-way axis)
    assert unet_kernel_spec is not None and unet_kernel_spec != P()
    # counts / scalars replicate
    for path, spec in _named_specs(opt_sh).items():
        if "count" in str(path):
            assert spec == P()


def test_dp_mode_everything_replicates(eight_cpu_devices):
    mesh = create_mesh(8)
    trainable = {"unet": {"k": jnp.zeros((8, 8))}}
    t_sh = trainable_shardings(trainable, mesh, mode="dp")
    opt_state = optax.adam(1e-3).init(trainable)
    opt_sh = optimizer_state_shardings(opt_state, trainable, t_sh, mesh)
    for _, spec in _named_specs(opt_sh).items():
        assert spec == P()


def test_device_put_round_trip(eight_cpu_devices):
    """The produced shardings are actually placeable (no spec/shape clash)."""
    mesh = create_mesh(8)
    trainable = {"unet": {"k": jnp.zeros((32, 8)), "v": jnp.zeros((7, 3))}}
    t_sh = trainable_shardings(trainable, mesh, mode="fsdp")
    opt_state = optax.adam(1e-3).init(trainable)
    opt_sh = optimizer_state_shardings(opt_state, trainable, t_sh, mesh)
    placed = jax.tree.map(jax.device_put, opt_state, opt_sh)
    chex = jax.tree.leaves(placed)
    assert all(np.asarray(x).shape == np.asarray(y).shape
               for x, y in zip(jax.tree.leaves(opt_state), chex))
