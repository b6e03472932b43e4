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


def batch_sharding(mesh: Mesh, axis_name: str = "data", leading: int = 1) -> NamedSharding:
    """Shard the per-microbatch batch dim. Arrays are [accum, B, ...] with
    `leading`=1, or [K, accum, B, ...] with `leading`=2 (steps_per_call
    stacking) — the B axis sits after `leading` unsharded axes."""
    return NamedSharding(mesh, P(*([None] * leading), axis_name))


def shard_batch_tree(batch, mesh: Mesh, axis_name: str = "data", leading: int = 1):
    """Apply batch sharding to every batch leaf; scalars/small leaves replicate."""
    bsh = batch_sharding(mesh, axis_name, leading)
    rep = replicated(mesh)

    def put(x):
        if getattr(x, "ndim", 0) >= leading + 1:
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


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}


def collective_stats(compiled) -> dict:
    """Best-effort per-step collective traffic from a compiled executable.

    Parses the optimized HLO text for collective ops (all-reduce, all-gather,
    reduce-scatter, collective-permute, all-to-all, incl. async -start forms)
    and sums their output bytes. Returns {op_name: {"count": n, "bytes": b}}
    plus a "total_bytes" key; {} if the HLO text is unavailable.
    """
    import re

    try:
        text = compiled.as_text()
    except Exception:
        return {}
    # result shapes: `= f32[128,4]{1,0} all-reduce(` or tuple results
    # `= (f32[128]{0}, /*index=1*/f32[64]{0}) all-gather-start(`. TPU
    # post-optimization HLO additionally carries tiled layouts with parens,
    # e.g. `f32[8,128]{1,0:T(8,128)}` — so the shape part is matched lazily
    # up to the op name on the same line rather than by paren counting.
    op_re = re.compile(
        r"=\s+(.+?)\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
        r"(-start)?\("
    )
    shape_re = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    stats: dict = {}
    for m in op_re.finditer(text):
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for sm in shape_re.finditer(shapes):
            dt, dims = sm.group(1), sm.group(2)
            size = 1
            for d in dims.split(","):
                if d:
                    size *= int(d)
            nbytes += size * _DTYPE_BYTES.get(dt, 4)
        ent = stats.setdefault(op, {"count": 0, "bytes": 0})
        ent["count"] += 1
        ent["bytes"] += nbytes
    stats["total_bytes"] = sum(
        v["bytes"] for k, v in stats.items() if isinstance(v, dict)
    )
    return stats


def trainable_shardings(trainable, mesh: Mesh, mode: str = "dp", axis_name: str = "data"):
    """Sharding tree for the trainable pytree: dp/tp=replicate everything
    (adapters are MBs; under tp the FROZEN base is what shards),
    fsdp=shard the full-finetune unet group, replicate adapters/TI."""
    if mode in ("dp", "tp"):
        return replicated_shardings(trainable, mesh)
    out = {}
    for group, sub in trainable.items():
        if group == "unet":
            out[group] = fsdp_shardings(sub, mesh, axis_name)
        else:
            out[group] = replicated_shardings(sub, mesh)
    return out


def _path_keys(path) -> tuple:
    """Normalize a jax key-path to a tuple of strings."""
    out = []
    for k in path:
        v = getattr(k, "key", None)
        if v is None:
            v = getattr(k, "idx", None)
        if v is None:
            v = getattr(k, "name", None)
        out.append(str(k) if v is None else str(v))
    return tuple(out)


def optimizer_state_shardings(opt_state, trainable, trainable_sh, mesh: Mesh):
    """Sharding tree for the optimizer state, derived STRUCTURALLY from the
    trainable shardings: optax moment trees (mu/nu, slot variables) mirror the
    param tree inside each transform's state, so a moment leaf whose key-path
    *ends with* the key-path of a trainable param — and whose shape matches —
    inherits that param's sharding. Counts/scalars and unmatched leaves
    replicate.

    This recovers group membership by position in the tree, not by shape
    equality, so e.g. a TI row that coincidentally shares a shape with some
    unet param still replicates alongside its (replicated) param — shape-only
    matching would fsdp-shard its moments and reintroduce per-step GSPMD
    resharding.
    """
    rep = replicated(mesh)
    param_map: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(trainable)[0]:
        param_map[_path_keys(path)] = tuple(getattr(leaf, "shape", ()))
    sh_map: dict = {}
    for path, sh in jax.tree_util.tree_flatten_with_path(
        trainable_sh, is_leaf=lambda x: isinstance(x, NamedSharding)
    )[0]:
        sh_map[_path_keys(path)] = sh

    def spec_for(path, leaf):
        keys = _path_keys(path)
        shape = tuple(getattr(leaf, "shape", ()))
        # longest path suffix that names a trainable param of the same shape
        for start in range(len(keys)):
            suffix = keys[start:]
            if param_map.get(suffix) == shape and suffix in sh_map:
                return sh_map[suffix]
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, opt_state)


# ---------------------------------------------------------------------------
# Tensor parallelism (optional; SURVEY §2.4 "2-way sharding of attention
# heads"). Megatron-style specs for the UNet transformer blocks: QKV and the
# GEGLU up-projection are column-sharded (attention heads / ff channels split
# across the 'model' axis), the output/down projections row-sharded so XLA
# inserts one psum per block. Convs, norms, time embeddings replicate — at
# SD scale they are not worth sharding. NOTE: the Pallas flash-attention
# custom call has no SPMD partitioning rules, so TP runs use einsum
# attention (train() gates this).
# ---------------------------------------------------------------------------

_TP_ATTN_COL = ("to_q", "to_k", "to_v")


def create_mesh_2d(
    n_data: int, n_model: int, axis_names=("data", "model")
) -> Mesh:
    """2-D mesh: batch on 'data', tensor-parallel shards on 'model'."""
    devices = jax.devices()[: n_data * n_model]
    assert len(devices) == n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(jax.devices())}"
    )
    return Mesh(np.array(devices).reshape(n_data, n_model), axis_names=axis_names)


def unet_tp_spec(path, leaf, mesh: Mesh, axis_name: str = "model") -> P:
    """PartitionSpec for one UNet param leaf under tensor parallelism."""
    n = mesh.shape[axis_name]
    keys = [getattr(k, "key", getattr(k, "idx", k)) for k in path]
    keys = [str(k) for k in keys]
    leafname = keys[-1] if keys else ""
    parent = keys[-2] if len(keys) >= 2 else ""
    grand = keys[-3] if len(keys) >= 3 else ""

    def col() -> P:  # shard OUTPUT features
        if leafname == "kernel" and getattr(leaf, "ndim", 0) == 2 and leaf.shape[1] % n == 0:
            return P(None, axis_name)
        if leafname == "bias" and getattr(leaf, "ndim", 0) == 1 and leaf.shape[0] % n == 0:
            return P(axis_name)
        return P()

    def row() -> P:  # shard INPUT features; bias replicated (added post-psum)
        if leafname == "kernel" and getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] % n == 0:
            return P(axis_name, None)
        return P()

    if grand in ("attn1", "attn2") and parent in _TP_ATTN_COL:
        return col()
    if grand in ("attn1", "attn2") and parent == "to_out.0":
        return row()
    if parent == "ff.net.0.proj":
        # GEGLU proj in the [in, 2, inner] TP layout (unet_tp_geglu_reshape):
        # shard the INNER axis so every device holds matching value/gate
        # column slices — a contiguous split of the flat [in, 2*inner] kernel
        # would place each GEGLU half wholly on one device and force
        # resharding at a*gelu(b) every block.
        if leafname == "kernel" and getattr(leaf, "ndim", 0) == 3 and leaf.shape[2] % n == 0:
            return P(None, None, axis_name)
        if leafname == "bias" and getattr(leaf, "ndim", 0) == 2 and leaf.shape[1] % n == 0:
            return P(None, axis_name)
        return P()
    if parent == "ff.net.2":
        return row()
    return P()


def unet_tp_shardings(unet_params, mesh: Mesh, axis_name: str = "model"):
    """NamedSharding tree for a (frozen or trainable) UNet param pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, unet_tp_spec(path, leaf, mesh, axis_name)),
        unet_params,
    )


def unet_tp_geglu_reshape(unet_params):
    """Re-layout every GEGLU up-projection for tensor parallelism:
    kernel [in, 2*inner] -> [in, 2, inner], bias [2*inner] -> [2, inner].

    The flat layout stores the value and gate halves contiguously (torch
    GEGLU chunk semantics, preserved by weight conversion); the 3-D view puts
    them on their own axis so a 'model'-axis shard of the LAST axis keeps
    matching a/b slices co-resident. The UNet forward consumes either layout
    (models/unet.py GEGLU branch)."""

    def fix(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        parent = keys[-2] if len(keys) >= 2 else ""
        name = keys[-1] if keys else ""
        if parent == "ff.net.0.proj" and name == "kernel" and leaf.ndim == 2:
            return leaf.reshape(leaf.shape[0], 2, leaf.shape[1] // 2)
        if parent == "ff.net.0.proj" and name == "bias" and leaf.ndim == 1:
            return leaf.reshape(2, leaf.shape[0] // 2)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, unet_params)
