"""The jitted training step.

Everything the reference does per step across python-land (trainer/main.py:
263-464 — text-encoder forward, noise/timestep sampling, UNet forward through
peft-LoRA layers with DAAM side effects, four loss terms, backward, three
optimizer steps, TI-row grad masking) is ONE pure function here, jitted once
and donated, optionally pjit-sharded over a mesh (parallel/sharding.py).

Design:
- trainable pytree: {"unet": lora-tree | full-param-tree,
                     "ti": {"te1": rows, "te2": rows},
                     "te_lora": {"te1": tree, "te2": tree}} (groups optional)
- frozen models are closed over (jit constants / donated buffers)
- PRNG: one key in TrainState, folded per step; noise / offset noise /
  timesteps / latent sampling each get their own stream
- gradient accumulation: leading [accum, B, ...] dim consumed by lax.scan
  (reference: main.py:362-366 divides the loss and steps on the boundary)
- the VAE latent *distribution* is the batch input; a fresh latent is sampled
  in-step (the reference samples per epoch at dataset access,
  trainer/dataset.py:186 — same regularization, fresher)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.diffusion.losses import (
    DistributionLossTargets,
    TARGET_PROMPT_NORM,
    diffusion_loss,
    lora_l1_penalty,
    prompt_norm_regularization,
    token_attention_loss,
)
from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule
from sd_lora_trainer_tpu.models.clip import CLIPTextConfig
from sd_lora_trainer_tpu.models.conditioning import sd15_conditioning, sdxl_conditioning
from sd_lora_trainer_tpu.models.lora import inject_lora
from sd_lora_trainer_tpu.models.unet import UNetConfig, unet_forward


@chex.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Any
    opt_state: Any
    key: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrozenModels:
    """Non-trainable model bundle, passed as a pytree ARGUMENT to the jitted
    step. (Closing over multi-GB device arrays would embed them as literal
    constants in the lowered HLO — pathological for compile memory/time,
    especially with remote compilation.) Configs are static pytree metadata."""

    unet_params: Any
    te1_params: Any
    te2_params: Any  # None for sd15
    schedule: DDPMSchedule
    distribution_targets: Dict[str, DistributionLossTargets]  # "te1"/"te2"
    unet_config: UNetConfig = dataclasses.field(metadata=dict(static=True))
    te1_config: CLIPTextConfig = dataclasses.field(metadata=dict(static=True))
    te2_config: Optional[CLIPTextConfig] = dataclasses.field(metadata=dict(static=True))
    version: str = dataclasses.field(metadata=dict(static=True))  # "sd15" | "sdxl"
    resolution: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))  # (W, H)


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static scalars lifted out of TrainingConfig (hashable for jit)."""

    snr_gamma: float
    noise_offset: float
    l1_penalty: float
    token_attention_loss_w: float
    cond_reg_w: float
    tok_cov_reg_w: float
    std_loss_w: float  # reference hardcodes 0.01 (loss.py:196)
    grad_accum: int
    is_lora: bool
    train_ti: bool
    train_te_lora: bool
    use_flash: bool
    remat: object  # False | True | "dots" (remat policy)
    max_train_steps: int
    ti_freeze_f: float
    ti_lr: float
    daam_img_ratio: float
    # (Mesh, data_axis, model_axis) under tensor parallelism: run flash
    # attention via shard_map over the head axis (ops/attention.py:tp_shard).
    # Hashable (Mesh is), so it can live in this static config.
    flash_tp: object = None
    # Names whose remat stash is row-wise int8 (ops/stash8.py); "" = none.
    stash8: str = ""
    # Rematerialize the text-encoder conditioning (jax.checkpoint, nothing
    # saveable). Set by quantize_base "int8+te": without it the dequantized
    # bf16 TE kernels stay live fwd->bwd and the int8 storage frees nothing.
    remat_te: bool = False

    @classmethod
    def from_config(cls, config: TrainingConfig, img_ratio: float) -> "StepConfig":
        remat = config.remat
        quantize_base = config.resolve_quantize_base()
        if remat == "auto":
            # Measured plans (BENCH_NOTES.md): at <=512px SD15's full
            # activation set fits 16G HBM, so remat is pure recompute waste
            # (25.4 -> 31.4 imgs/s with it off). SDXL with the int8 frozen
            # base (quantize_base "auto" -> int8 for SDXL LoRA) runs the
            # round-5 winner — plain-resnet layers save all activations, the
            # attention layers save the flash residuals (4.17 -> 4.42 imgs/s
            # @1024px bs=8; the freed ~2.4 GB pays for the lighter plan).
            # bf16-base SDXL keeps full block remat + flash-residual saves
            # (every richer bf16 save: plan is ~1 GB past the HBM frontier,
            # r4 lever table). Resolved HERE so every consumer (train loop,
            # bench, dryruns, tests) gets a concrete plan — unet_forward
            # rejects unresolved strings.
            sizes = config.train_img_size
            if not sizes:  # preprocessing hasn't derived it yet (bench/tests)
                r = config.resolution
                sizes = r if isinstance(r, (list, tuple)) else (r, r)
            res = max(sizes)
            if (
                config.sd_model_version == "sd15"
                and res <= 512
                and config.train_batch_size <= 16
            ):
                remat = False
            elif quantize_base in ("int8", "int8+te"):
                remat = "light+save:flash_out*,flash_lse*"
            else:
                remat = "save:flash_out*,flash_lse*"
        return cls(
            snr_gamma=config.snr_gamma,
            noise_offset=config.noise_offset,
            l1_penalty=config.l1_penalty,
            token_attention_loss_w=config.token_attention_loss_w,
            cond_reg_w=config.cond_reg_w,
            tok_cov_reg_w=config.tok_cov_reg_w,
            std_loss_w=0.01,
            grad_accum=config.gradient_accumulation_steps,
            is_lora=config.is_lora,
            train_ti=not config.disable_ti,
            train_te_lora=config.text_encoder_lora_optimizer is not None,
            use_flash=True,
            remat=remat,
            stash8=config.remat_stash8,
            remat_te=quantize_base == "int8+te",
            max_train_steps=config.max_train_steps,
            ti_freeze_f=config.freeze_ti_after_completion_f,
            ti_lr=config.ti_lr,
            daam_img_ratio=img_ratio,
        )


def _unet_params_with_adapters(frozen: FrozenModels, trainable, sc: StepConfig):
    if not sc.is_lora:
        return trainable["unet"]  # full finetune: trainable IS the unet
    if "unet" in trainable:
        return inject_lora(frozen.unet_params, trainable["unet"])
    return frozen.unet_params


def _te_params_with_adapters(frozen: FrozenModels, trainable, which: str):
    base = frozen.te1_params if which == "te1" else frozen.te2_params
    if base is None:
        return None
    te_lora = trainable.get("te_lora", {})
    if which in te_lora:
        return inject_lora(base, te_lora[which])
    return base


def compute_loss(
    trainable,
    frozen: FrozenModels,
    sc: StepConfig,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    step: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One micro-batch loss with every reference term (main.py:306-360)."""
    k_latent, k_noise, k_offset, k_t = jax.random.split(key, 4)

    # latent sampling from the cached VAE distribution
    mean, logvar = batch["latent_mean"], batch["latent_logvar"]
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    latent = mean.astype(jnp.float32) + std * jax.random.normal(k_latent, mean.shape)
    latent = (latent * batch["latent_scale"]).astype(mean.dtype)

    # conditioning (grads flow into TI rows / TE-LoRA)
    ti = trainable.get("ti", {})

    def run_cond(tr):
        ti_ = tr.get("ti", {})
        if frozen.version == "sdxl":
            return sdxl_conditioning(
                _te_params_with_adapters(frozen, tr, "te1"),
                _te_params_with_adapters(frozen, tr, "te2"),
                batch["input_ids"],
                batch["input_ids_2"],
                frozen.te1_config,
                frozen.te2_config,
                frozen.resolution,
                ti_rows_1=ti_.get("te1"),
                ti_rows_2=ti_.get("te2"),
                dtype=latent.dtype,
            )
        pe, _, _ = sd15_conditioning(
            _te_params_with_adapters(frozen, tr, "te1"),
            batch["input_ids"],
            frozen.te1_config,
            ti_rows=ti_.get("te1"),
            dtype=latent.dtype,
        )
        return pe, None, None

    if sc.remat_te:
        # With int8-quantized TEs (quantize_base "int8+te") the backward pass
        # would otherwise pin every DEQUANTIZED bf16 kernel from forward to
        # backward (TEs aren't block-rematted like the UNet), negating the
        # quantization. Rematerializing the whole conditioning keeps only the
        # int8 codes + the [B,77,*] outputs live; the TE re-forward is ~1% of
        # step FLOPs at 77 tokens.
        prompt_embeds, pooled, add_time_ids = jax.checkpoint(
            run_cond, policy=jax.checkpoint_policies.nothing_saveable
        )(trainable)
    else:
        prompt_embeds, pooled, add_time_ids = run_cond(trainable)
    added_cond = (
        {"text_embeds": pooled, "time_ids": add_time_ids}
        if frozen.version == "sdxl"
        else None
    )

    # noise (+ offset noise, crosslabs blog; reference main.py:310-317)
    noise = jax.random.normal(k_noise, latent.shape, latent.dtype)
    if sc.noise_offset > 0.0:
        b, _, _, c = latent.shape
        noise = noise + sc.noise_offset * jax.random.normal(
            k_offset, (b, 1, 1, c), latent.dtype
        )
    timesteps = jax.random.randint(
        k_t, (latent.shape[0],), 0, frozen.schedule.num_train_timesteps
    )
    noisy_latent = frozen.schedule.add_noise(latent, noise, timesteps)

    unet_params = _unet_params_with_adapters(frozen, trainable, sc)
    capture = sc.train_ti and sc.token_attention_loss_w > 0.0
    model_pred, attn_scores = unet_forward(
        unet_params,
        noisy_latent,
        timesteps,
        prompt_embeds,
        frozen.unet_config,
        added_cond=added_cond,
        capture_attn=capture,
        use_flash=sc.use_flash,
        remat=sc.remat,
        flash_tp=sc.flash_tp,
        stash8=sc.stash8,
    )

    mask = batch["mask"]
    img_loss = diffusion_loss(
        model_pred, noise, noisy_latent, latent, mask, frozen.schedule, timesteps, sc.snr_gamma
    )
    loss = img_loss
    aux: Dict[str, jnp.ndarray] = {"img_loss": img_loss}

    if capture:
        attn_loss = token_attention_loss(
            attn_scores,
            mask,
            sc.daam_img_ratio,
            batch["caption_token_lengths"],
            batch["ti_token_positions"],
        )
        loss = loss + sc.token_attention_loss_w * attn_loss
        aux["token_attention_loss"] = attn_loss

    if sc.l1_penalty > 0.0 and sc.is_lora and "unet" in trainable:
        # normalized L1 over the LoRA a/b matrices only (main.py:353-356)
        mats = [m for _, entry in _iter_lora_mats(trainable["unet"]) for m in (entry["a"], entry["b"])]
        l1 = lora_l1_penalty(mats)
        loss = loss + sc.l1_penalty * l1
        aux["l1_norm"] = l1

    # conditioning / token-distribution regularizers, gated on TI being
    # actively trained (reference main.py:358-359 applies only when the TI
    # optimizer exists and its LR > 0)
    if sc.train_ti:
        f = step.astype(jnp.float32) / sc.max_train_steps
        ti_active = jnp.where(f > sc.ti_freeze_f, 0.0, 1.0)

        if sc.cond_reg_w > 0.0:
            target = TARGET_PROMPT_NORM[frozen.version]
            reg, observed = prompt_norm_regularization(prompt_embeds, target)
            loss = loss + ti_active * sc.cond_reg_w * reg
            aux["prompt_norm"] = observed

        cov_losses, std_losses = [], []
        for which, rows in ti.items():
            if rows is None:
                continue
            targets = frozen.distribution_targets[which]
            if sc.tok_cov_reg_w > 0.0:
                cov_losses.append(targets.covariance_loss(rows))
            if sc.std_loss_w > 0.0:
                std_losses.append(targets.std_loss(rows))
        if cov_losses:
            cov = jnp.mean(jnp.stack(cov_losses))
            loss = loss + ti_active * sc.tok_cov_reg_w * cov
            aux["covariance_tok_reg_loss"] = cov
        if std_losses:
            stdl = jnp.mean(jnp.stack(std_losses))
            loss = loss + ti_active * sc.std_loss_w * stdl
            aux["token_std_loss"] = stdl

    aux["tot_loss"] = loss
    return loss, aux


def _iter_lora_mats(tree, path=()):
    """Yield (dotted_path, {a,b,...}) for lora leaves (L1 penalty surface)."""
    if isinstance(tree, dict):
        if "a" in tree and "b" in tree:
            yield ".".join(map(str, path)), tree
            return
        for k, v in tree.items():
            yield from _iter_lora_mats(v, path + (k,))


def make_train_step(
    sc: StepConfig,
    optimizer: optax.GradientTransformation,
):
    """Build the jitted (state, batch, frozen) -> (state, metrics) function.

    `batch` arrays carry a leading [accum] dim; accumulation runs as a scan
    with loss averaged over micro-batches, exactly the reference's
    loss/grad_accum + boundary step (main.py:362-382). `frozen` (the
    FrozenModels pytree) is a runtime argument so the multi-GB base weights
    are jit parameters, never baked-in constants.
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], frozen: FrozenModels):
        key = jax.random.fold_in(state.key, state.step)

        def micro(i, trainable):
            # index into the [accum, ...] leading dim; scalars ride through
            mb = jax.tree.map(lambda x: x[i] if x.ndim > 0 else x, batch)
            return compute_loss(
                trainable, frozen, sc, mb, jax.random.fold_in(key, i), state.step
            )

        def accum_body(carry, i):
            grads_acc, aux_acc = carry
            (loss, aux), grads = jax.value_and_grad(
                lambda t: micro(i, t), has_aux=True
            )(state.trainable)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            aux_acc = jax.tree.map(jnp.add, aux_acc, aux)
            return (grads_acc, aux_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.trainable)
        _, aux_shape = jax.eval_shape(lambda: micro(0, state.trainable))
        zero_aux = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_shape)

        (grads, aux_sum), _ = jax.lax.scan(
            accum_body, (zero_grads, zero_aux), jnp.arange(sc.grad_accum)
        )
        grads = jax.tree.map(lambda g: g / sc.grad_accum, grads)
        aux = jax.tree.map(lambda a: a / sc.grad_accum, aux_sum)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)

        new_state = TrainState(
            step=state.step + 1,
            trainable=new_trainable,
            opt_state=new_opt_state,
            key=state.key,
        )
        metrics = dict(aux)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
