"""Gradient-sync correctness on the virtual 8-device mesh.

The core multi-chip claim (SURVEY.md §2.4): one data-parallel step over the
mesh must be numerically equivalent to a single-device step on the same
(concatenated) global batch — XLA's grad all-reduce replaces nothing and
loses nothing. Also pins that the compiled DP step actually contains
collective traffic (a silently-unsharded program would pass the equivalence
check trivially).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.diffusion.losses import DistributionLossTargets
from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule
from sd_lora_trainer_tpu.models.clip import init_clip_params
from sd_lora_trainer_tpu.models.lora import (
    TEXT_ENCODER_TARGETS,
    UNET_TARGETS,
    create_lora_params,
)
from sd_lora_trainer_tpu.models.synthesize import TINY_CLIP_G_CONFIG, TINY_CLIP_L_CONFIG
from sd_lora_trainer_tpu.models.unet import TINY_SDXL_UNET_CONFIG, init_unet_params
from sd_lora_trainer_tpu.parallel.sharding import (
    collective_stats,
    create_mesh,
    replicated,
    shard_batch_tree,
    trainable_shardings,
)
from sd_lora_trainer_tpu.training.optimizers import build_optimizer
from sd_lora_trainer_tpu.training.step import (
    FrozenModels,
    StepConfig,
    TrainState,
    make_train_step,
)


@pytest.fixture(scope="module")
def tiny_setup():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    unet_cfg = TINY_SDXL_UNET_CONFIG
    unet = init_unet_params(ks[0], unet_cfg, dtype=jnp.float32)
    te1 = init_clip_params(ks[1], TINY_CLIP_L_CONFIG, dtype=jnp.float32)
    te2 = init_clip_params(ks[2], TINY_CLIP_G_CONFIG, dtype=jnp.float32)
    t1 = te1["text_model"]["embeddings"]["token_embedding"]["weight"]
    t2 = te2["text_model"]["embeddings"]["token_embedding"]["weight"]
    frozen = FrozenModels(
        unet_params=unet,
        unet_config=unet_cfg,
        te1_params=te1,
        te1_config=TINY_CLIP_L_CONFIG,
        te2_params=te2,
        te2_config=TINY_CLIP_G_CONFIG,
        schedule=DDPMSchedule.create(),
        version="sdxl",
        resolution=(16, 16),
        distribution_targets={
            "te1": DistributionLossTargets.from_embeddings(t1),
            "te2": DistributionLossTargets.from_embeddings(t2),
        },
    )
    config = TrainingConfig(
        lora_training_urls="equiv", concept_mode="style", sd_model_version="sdxl",
        max_train_steps=10, lora_rank=4, text_encoder_lora_optimizer="adamw",
        _testing_no_output_dir=True,
    )
    trainable = {
        "unet": create_lora_params(ks[3], unet, rank=4, targets=UNET_TARGETS),
        "ti": {
            "te1": jax.random.normal(ks[4], (3, 32)) * 0.01,
            "te2": jax.random.normal(ks[5], (3, 32)) * 0.01,
        },
        "te_lora": {
            "te1": create_lora_params(ks[6], te1, rank=4, targets=TEXT_ENCODER_TARGETS),
            "te2": create_lora_params(ks[7], te2, rank=4, targets=TEXT_ENCODER_TARGETS),
        },
    }

    batch_size = 8
    ids = np.full((1, batch_size, 77), 255, np.int32)
    ids[..., 0] = 254
    ids[..., 1:4] = [256, 257, 258]
    batch = {
        "latent_mean": np.random.RandomState(0)
        .randn(1, batch_size, 16, 16, 4)
        .astype(np.float32),
        "latent_logvar": np.full((1, batch_size, 16, 16, 4), -6.0, np.float32),
        "mask": np.ones((1, batch_size, 16, 16, 1), np.float32),
        "input_ids": ids,
        "input_ids_2": ids,
        "caption_token_lengths": np.full((1, batch_size), 6, np.int32),
        "ti_token_positions": np.tile(np.array([[1, 2, 3]]), (1, batch_size, 1)),
        "latent_scale": np.float32(0.13025),
    }
    sc = StepConfig.from_config(config, 1.0)
    sc = dataclasses.replace(sc, use_flash=False, is_lora=True)
    return frozen, config, trainable, batch, sc


def _fresh_state(config, trainable, optimizer, shardings=None, mesh=None):
    if shardings is not None:
        trainable = jax.tree.map(jax.device_put, trainable, shardings)
        opt_state = jax.jit(optimizer.init, in_shardings=(shardings,))(trainable)
        rep = replicated(mesh)
        step = jax.device_put(jnp.zeros((), jnp.int32), rep)
        key = jax.device_put(jax.random.PRNGKey(7), rep)
    else:
        opt_state = jax.jit(optimizer.init)(trainable)
        step = jnp.zeros((), jnp.int32)
        key = jax.random.PRNGKey(7)
    return TrainState(step=step, trainable=trainable, opt_state=opt_state, key=key)


@pytest.mark.slow
def test_dp_step_equals_single_device_step(eight_cpu_devices, tiny_setup):
    frozen, config, trainable, batch, sc = tiny_setup
    optimizer = build_optimizer(config, trainable)
    step_fn = make_train_step(sc, optimizer)

    # single-device: full global batch on device 0
    state1 = _fresh_state(config, trainable, optimizer)
    new1, metrics1 = jax.jit(step_fn)(state1, jax.tree.map(jnp.asarray, batch), frozen)
    jax.block_until_ready(new1.trainable)

    # 8-device DP: batch sharded on the data axis, adapters replicated
    mesh = create_mesh(8)
    t_sh = trainable_shardings(trainable, mesh, mode="dp")
    state8 = _fresh_state(config, trainable, optimizer, shardings=t_sh, mesh=mesh)
    sharded_batch = shard_batch_tree(batch, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        compiled = jax.jit(step_fn).lower(state8, sharded_batch, frozen).compile()
        new8, metrics8 = compiled(state8, sharded_batch, frozen)
    jax.block_until_ready(new8.trainable)

    # the compiled DP program must actually move gradient bytes
    stats = collective_stats(compiled)
    assert stats.get("total_bytes", 0) > 10_000, f"no real collective traffic: {stats}"

    # loss equivalence
    np.testing.assert_allclose(
        float(metrics1["tot_loss"]), float(metrics8["tot_loss"]), rtol=1e-5, atol=1e-6
    )

    # post-step trainable equivalence (grad all-reduce == local full-batch grad)
    flat1, tree1 = jax.tree.flatten(new1.trainable)
    flat8, tree8 = jax.tree.flatten(new8.trainable)
    assert tree1 == tree8
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
