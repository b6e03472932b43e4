"""Checkpoint module tests: artifact save/load and orbax train-state resume
(the resume capability the reference lacks — SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sd_lora_trainer_tpu.checkpoint import (
    restore_train_state,
    save_checkpoint,
    save_train_state,
)
from sd_lora_trainer_tpu.training.step import TrainState


def _state(seed=0):
    key = jax.random.PRNGKey(seed)
    trainable = {
        "unet": {"m": jax.random.normal(key, (8, 4))},
        "ti": {"te1": jax.random.normal(jax.random.fold_in(key, 1), (3, 16))},
    }
    opt = optax.adam(1e-3)
    return opt, TrainState(
        step=jnp.asarray(7, jnp.int32),
        trainable=trainable,
        opt_state=opt.init(trainable),
        key=key,
    )


def test_train_state_roundtrip(tmp_path):
    opt, state = _state()
    path = str(tmp_path / "train_state")
    save_train_state(path, state)

    _, template = _state(seed=99)  # different values, same structure
    restored = restore_train_state(path, template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.trainable["unet"]["m"]),
        np.asarray(state.trainable["unet"]["m"]),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(restored.key), np.asarray(state.key))


def test_resume_continues_identically(tmp_path):
    """Optimizer moments survive: stepping after restore == stepping the
    original — the mid-run resume contract."""
    opt, state = _state()
    grads = jax.tree.map(jnp.ones_like, state.trainable)

    def step(s):
        updates, new_opt = opt.update(grads, s.opt_state, s.trainable)
        return TrainState(
            step=s.step + 1,
            trainable=optax.apply_updates(s.trainable, updates),
            opt_state=new_opt,
            key=s.key,
        )

    # run 3 steps, snapshot, run 2 more
    for _ in range(3):
        state = step(state)
    path = str(tmp_path / "ts")
    save_train_state(path, state)
    expected = step(step(state))

    _, template = _state(seed=5)
    for _ in range(3):
        template = step(template)  # shape/structure-matching template
    restored = restore_train_state(path, template)
    resumed = step(step(restored))

    np.testing.assert_allclose(
        np.asarray(resumed.trainable["unet"]["m"]),
        np.asarray(expected.trainable["unet"]["m"]),
        rtol=1e-6,
    )
    assert int(resumed.step) == int(expected.step) == 12  # 7 initial + 3 + 2


def test_full_finetune_checkpoint_exports_unet(tmp_path):
    from sd_lora_trainer_tpu.models.unet import TINY_SD15_UNET_CONFIG, init_unet_params

    params = init_unet_params(jax.random.PRNGKey(0), TINY_SD15_UNET_CONFIG, dtype=jnp.float32)
    out = str(tmp_path)
    save_checkpoint(
        output_dir=out,
        global_step=10,
        name="full",
        pretrained_model_version="sd15",
        token_dict={"TOK": "<s0>"},
        is_lora=False,
        ti_rows=[None, None],
        unet_params=params,
        unet_config=TINY_SD15_UNET_CONFIG,
    )
    assert os.path.exists(os.path.join(out, "unet_finetuned.safetensors"))
    from sd_lora_trainer_tpu.models.weights import convert_ldm_unet
    from sd_lora_trainer_tpu.utils.safetensors_io import load_safetensors

    sd = load_safetensors(os.path.join(out, "unet_finetuned.safetensors"))
    back = convert_ldm_unet({k: jnp.asarray(v) for k, v in sd.items()}, TINY_SD15_UNET_CONFIG, jnp.float32)
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(back)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
