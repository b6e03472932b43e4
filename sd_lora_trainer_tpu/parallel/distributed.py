"""Multi-host (multi-process) support.

The reference is strictly single-process (SURVEY.md §2.4); its only
distributed hook is BucketManager's rank sharding
(trainer/utils/aspect_ratio_bucketing.py:133-135). On TPU, a v5e-16+ slice or
any multi-slice topology runs one Python process per host, each owning a
subset of the chips — JAX's runtime handles cross-host collectives over
ICI/DCN once `jax.distributed.initialize` has formed the cluster.

Design (exact single-process equivalence):
- every process runs the same deterministic host pipeline (same seed -> same
  EpochSampler permutation, same caption-dropout stream, same bucket
  sequence) and assembles the identical full GLOBAL batch;
- the global on-device batch is formed with `jax.make_array_from_callback`
  over the global mesh — each process materializes only its addressable
  shards, with no host-side collectives — so the jitted step sees exactly the
  arrays a single-process run would: same collectives, same loss;
- `config.train_batch_size` stays GLOBAL (sharded over the 'data' axis that
  spans all hosts' devices);
- checkpoint/render/plots run on process 0 only; sharded train state is
  all-gathered (a collective every process enters) before process 0 writes.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from sd_lora_trainer_tpu.parallel.sharding import batch_sharding, replicated


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Form the JAX process cluster when the environment asks for one.

    Returns (process_count, process_index). Gated on env so single-host runs
    (the reference's envelope) never touch jax.distributed:

    - SDT_COORDINATOR + SDT_NUM_PROCESSES + SDT_PROCESS_ID: explicit cluster
      (any backend, incl. the CPU Gloo backend tests use);
    - TPU pod slices (TPU_WORKER_HOSTNAMES / MEGASCALE_COORDINATOR_ADDRESS
      set by the TPU runtime): auto-bootstrap via jax.distributed's TPU
      cluster detection.

    Must run before the backend initializes (first jax.devices() call) —
    which is why the CLI (main.py) calls this before importing the training
    stack (orbax's import initializes the backend). Idempotent: a second call
    after the cluster is up is a no-op.
    """
    coord = os.environ.get("SDT_COORDINATOR")
    nproc = os.environ.get("SDT_NUM_PROCESSES")
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if coord and nproc:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(os.environ.get("SDT_PROCESS_ID", "0")),
            )
        except RuntimeError as e:
            # second call in the same process (train() after the CLI already
            # formed the cluster) — verify the cluster is actually up;
            # anything else is a real failure because the caller explicitly
            # requested one
            if jax.process_count() != int(nproc):
                raise RuntimeError(
                    f"requested {nproc}-process cluster but initialize failed "
                    f"and process_count={jax.process_count()}: {e}"
                ) from e
    elif len(workers.split(",")) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        # TPU pod with MULTIPLE workers: connection info comes from the TPU
        # runtime env. (Single-worker setups also export TPU_WORKER_HOSTNAMES
        # — one hostname needs no cluster.) Best-effort: a backend that some
        # wrapper already initialized means single-process operation, not a
        # crash.
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # A backend some wrapper already initialized raises here even
            # when the cluster is fine — but on a GENUINE multi-worker slice
            # a silent fallback to single-process means every host trains
            # independently with the wrong world size and races on the
            # output dir. Verify the world size actually matches before
            # continuing (advisor r3).
            n_workers = len([w for w in workers.split(",") if w])
            if n_workers > 1 and jax.process_count() != n_workers:
                raise RuntimeError(
                    f"TPU slice advertises {n_workers} workers "
                    f"(TPU_WORKER_HOSTNAMES={workers!r}) but "
                    f"jax.distributed.initialize failed and "
                    f"process_count={jax.process_count()} — refusing to "
                    f"continue as an independent single-process run: {e}"
                ) from e
            print(f"[distributed] auto-initialize skipped: {e}")
    return jax.process_count(), jax.process_index()


def make_global_batch(global_batch, mesh: Mesh, leading: int = 1):
    """Assemble the global on-device batch from the (identical) full global
    host batch every process computed.

    Leaves with a batch axis (ndim > `leading`) are sharded on the 'data'
    axis spanning the global mesh; scalars replicate. Built with
    `jax.make_array_from_callback`, which materializes ONLY this process's
    addressable shards and performs **no host collectives** —
    make_array_from_process_local_data's assert_equal validation runs a Gloo
    gather with a 30 s key-value timeout, which flakes whenever ranks drift
    (e.g. compiling while timesharing cores). The result is indistinguishable
    from a single-process `shard_batch_tree` of the same batch — the jitted
    step compiles identically."""
    bsh = batch_sharding(mesh, leading=leading)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= leading + 1:
            return jax.make_array_from_callback(x.shape, bsh, lambda idx: x[idx])
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    return jax.tree.map(put, global_batch)


def gather_to_host(tree):
    """Fully replicate every leaf across processes and return numpy arrays.

    A collective: EVERY process must call this (process 0 then writes the
    result). Fully-replicated leaves pass through without communication."""
    from jax.experimental import multihost_utils

    def get(x):
        if not hasattr(x, "sharding"):
            return np.asarray(x)
        if x.sharding.is_fully_replicated:
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree.map(get, tree)
