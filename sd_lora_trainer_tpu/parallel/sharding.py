"""Mesh + sharding policy.

The reference is single-GPU (SURVEY.md §2.4: no DDP/NCCL anywhere); scaling
here is jax.sharding over a device mesh with XLA collectives riding ICI:

- **LoRA / TI runs (the common case)**: pure data parallelism. Adapter and
  optimizer state are tiny (MBs) and replicated; the global batch is sharded
  on the "data" axis; XLA inserts one psum over ICI for the grad all-reduce.
- **Full UNet finetuning**: FSDP-style parameter + optimizer-state sharding
  on the same axis (each leaf sharded along its largest divisible dimension),
  all-gather on use, reduce-scatter on grads — all emitted by XLA from the
  NamedSharding annotations, no hand-written collectives.

Frozen base params are replicated in both modes (they are read-only weights;
at SDXL scale they fit per-chip in bf16).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over local devices (v5e-8: 8 chips on ICI)."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the per-microbatch batch dim: arrays are [accum, B, ...]."""
    return NamedSharding(mesh, P(None, axis_name))


def shard_batch_tree(batch, mesh: Mesh, axis_name: str = "data"):
    """Apply batch sharding to every [accum, B, ...] leaf; scalars replicate."""
    bsh = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def put(x):
        if getattr(x, "ndim", 0) >= 2:
            return jax.device_put(x, bsh)
        return jax.device_put(x, rep)

    return jax.tree.map(put, batch)


def fsdp_spec(leaf, mesh: Mesh, axis_name: str = "data") -> P:
    """Shard a param leaf along its largest mesh-divisible axis (simple FSDP
    heuristic); replicate small/indivisible leaves."""
    n = mesh.shape[axis_name]
    if getattr(leaf, "ndim", 0) == 0 or leaf.size < 2 * n:
        return P()
    dims = list(leaf.shape)
    order = sorted(range(len(dims)), key=lambda i: -dims[i])
    for i in order:
        if dims[i] % n == 0:
            spec = [None] * len(dims)
            spec[i] = axis_name
            return P(*spec)
    return P()


def fsdp_shardings(params, mesh: Mesh, axis_name: str = "data"):
    return jax.tree.map(lambda p: NamedSharding(mesh, fsdp_spec(p, mesh, axis_name)), params)


def replicated_shardings(params, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda _: rep, params)


def trainable_shardings(trainable, mesh: Mesh, mode: str = "dp", axis_name: str = "data"):
    """Sharding tree for the trainable pytree: dp=replicate everything,
    fsdp=shard the full-finetune unet group, replicate adapters/TI."""
    if mode == "dp":
        return replicated_shardings(trainable, mesh)
    out = {}
    for group, sub in trainable.items():
        if group == "unet":
            out[group] = fsdp_shardings(sub, mesh, axis_name)
        else:
            out[group] = replicated_shardings(sub, mesh)
    return out
