"""Checkpoint save/load — the artifact compatibility contract.

`save_checkpoint` mirrors the reference's export surface
(trainer/checkpoint.py:104-221) artifact-for-artifact:

    {name}_{version}_embeddings.safetensors   TI rows, keys clip_l / clip_g
    special_params.json                       token map {"TOK": "<s0><s1><s2>"}
    {name}_{version}_lora.safetensors         kohya/WebUI LoRA (ComfyUI/A1111)
    training_args.json                        saved by the caller (train loop)
    unet_state/ (full finetune)               LDM-layout safetensors of the UNet

`load_checkpoint` is the inverse (reference trainer/checkpoint.py:223-296):
rebuild model params from the base checkpoint, re-attach TI rows and LoRA
adapters at a given scale, for from-disk validation and eval.

On top of the reference surface we add a *resumable* train state (one flat
safetensors file; see save_train_state for why not orbax)
(optimizer moments, PRNG key, step) — the reference cannot resume mid-run
(SURVEY.md §5): its checkpoints store exportable artifacts only.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.models.lora import kohya_state_dict, load_kohya_state_dict
from sd_lora_trainer_tpu.models.weights import export_ldm_unet
from sd_lora_trainer_tpu.training.embeddings import TXT_ENCODER_KEYS
from sd_lora_trainer_tpu.utils.safetensors_io import load_safetensors, save_safetensors
from sd_lora_trainer_tpu.utils.utils import sanitize_name


def save_checkpoint(
    output_dir: str,
    global_step: int,
    name: str,
    pretrained_model_version: str,
    token_dict: Dict[str, str],
    is_lora: bool,
    ti_rows: Optional[List[Optional[jnp.ndarray]]] = None,
    unet_lora: Optional[dict] = None,
    te_loras: Optional[List[Optional[dict]]] = None,
    unet_params: Optional[dict] = None,
    unet_config=None,
) -> None:
    """Write the full artifact set for one checkpoint."""
    os.makedirs(output_dir, exist_ok=True)
    name = sanitize_name(name)
    print(f"Saving checkpoint at step.. {global_step}")

    # 1) TI embeddings
    if ti_rows is not None and any(r is not None for r in ti_rows):
        tensors = {
            TXT_ENCODER_KEYS[i]: np.asarray(rows, np.float32)
            for i, rows in enumerate(ti_rows)
            if rows is not None
        }
        save_safetensors(
            tensors,
            os.path.join(output_dir, f"{name}_{pretrained_model_version}_embeddings.safetensors"),
        )

    # 2) token map
    with open(os.path.join(output_dir, "special_params.json"), "w") as f:
        json.dump(token_dict, f)

    # 3) adapters or full unet
    if is_lora:
        assert unet_lora is not None, "is_lora=True requires a unet adapter tree"
        sd = kohya_state_dict(unet_lora=unet_lora, te_loras=te_loras)
        save_safetensors(
            sd, os.path.join(output_dir, f"{name}_{pretrained_model_version}_lora.safetensors")
        )
    else:
        assert unet_params is not None and unet_config is not None
        sd = export_ldm_unet(unet_params, unet_config)
        save_safetensors(sd, os.path.join(output_dir, "unet_finetuned.safetensors"))


def find_lora_file(save_dir: str) -> Optional[str]:
    for f in sorted(os.listdir(save_dir)):
        if f.endswith("_lora.safetensors"):
            return os.path.join(save_dir, f)
    return None


def find_embeddings_file(save_dir: str) -> Optional[str]:
    for f in sorted(os.listdir(save_dir)):
        if f.endswith("embeddings.safetensors"):
            return os.path.join(save_dir, f)
    return None


def load_checkpoint(
    lora_save_path: str,
    unet_params: dict,
    te_params: List[Optional[dict]],
):
    """Read back a saved checkpoint's adapters + TI rows + token map.

    Returns dict(unet_lora, te_loras, ti_rows, token_dict). The caller merges
    adapters at a chosen lora_scale (models/lora.py merge_lora) — the
    equivalent of the reference's set_adapter_scales
    (trainer/checkpoint.py:31-55)."""
    assert os.path.exists(lora_save_path), f"Invalid lora_save_path: {lora_save_path}"

    token_dict = {}
    sp = os.path.join(lora_save_path, "special_params.json")
    if os.path.exists(sp):
        token_dict = json.load(open(sp))

    unet_lora, te_loras = None, [None] * len(te_params)
    lora_file = find_lora_file(lora_save_path)
    if lora_file:
        sd = load_safetensors(lora_file)
        unet_lora, te_loras = load_kohya_state_dict(sd, unet_params, te_params)

    ti_rows: List[Optional[np.ndarray]] = [None] * max(len(te_params), 2)
    emb_file = find_embeddings_file(lora_save_path)
    if emb_file:
        sd = load_safetensors(emb_file)
        for i, key in enumerate(TXT_ENCODER_KEYS):
            if key in sd:
                ti_rows[i] = sd[key]
            elif f"text_encoders_{i}" in sd:  # legacy fallback
                ti_rows[i] = sd[f"text_encoders_{i}"]

    return {
        "unet_lora": unet_lora,
        "te_loras": te_loras,
        "ti_rows": ti_rows,
        "token_dict": token_dict,
    }


# ---------------------------------------------------------------------------
# Resumable train state (flat safetensors) — capability the reference lacks
# ---------------------------------------------------------------------------


def save_train_state(path: str, state) -> None:
    """Persist TrainState (trainable + optimizer moments + step + key).

    Multiprocess: every rank must call this — sharded leaves (fsdp moments)
    are all-gathered (a collective), then rank 0 alone writes.

    The write itself is a single flat safetensors file (leaves in pytree
    order), NOT orbax: orbax's Checkpointer.save is itself a cross-process
    collective (sync_global_processes barriers every rank must reach), so a
    rank-0-only call after the gather would deadlock. A plain rank-local
    file write has no such coupling, and structure lives in the template the
    restorer already needs. The write is atomic (tmp + os.replace) so a
    crash mid-save never corrupts the rolling resume state."""
    path = os.path.abspath(path)
    tree = _as_pytree(state)
    if jax.process_count() > 1:
        from sd_lora_trainer_tpu.parallel.distributed import gather_to_host

        host_tree = gather_to_host(tree)  # collective: every rank enters
        if jax.process_index() != 0:
            return
    else:
        host_tree = jax.tree.map(np.asarray, tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from sd_lora_trainer_tpu.utils.safetensors_io import save_safetensors

    leaves = jax.tree_util.tree_leaves(host_tree)
    tensors = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    tmp = path + ".tmp"
    save_safetensors(tensors, tmp)
    os.replace(tmp, path)


def restore_train_state(path: str, template_state):
    from sd_lora_trainer_tpu.training.step import TrainState
    from sd_lora_trainer_tpu.utils.safetensors_io import load_safetensors

    if os.path.isdir(path):
        raise ValueError(
            f"train state at {path} is a DIRECTORY — the legacy orbax format "
            "from before the flat-safetensors change (orbax's collective save "
            "deadlocks rank-0-only multiprocess writes). Restart training "
            "without resume_from, or restore it with the orbax version of "
            "this module."
        )
    tmpl_tree = _as_pytree(template_state)
    treedef = jax.tree_util.tree_structure(tmpl_tree)
    sd = load_safetensors(os.path.abspath(path))
    leaves = [sd[k] for k in sorted(sd)]
    if len(leaves) != treedef.num_leaves:
        raise ValueError(
            f"train state at {path} has {len(leaves)} leaves but the current "
            f"model/optimizer configuration expects {treedef.num_leaves} — "
            "resume must use the same config the state was saved with"
        )
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return TrainState(
        step=jnp.asarray(restored["step"]),
        trainable=restored["trainable"],
        opt_state=restored["opt_state"],
        key=jnp.asarray(restored["key"]),
    )


def _as_pytree(state):
    return {
        "step": state.step,
        "trainable": state.trainable,
        "opt_state": state.opt_state,
        "key": state.key,
    }
