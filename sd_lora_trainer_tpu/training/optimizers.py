"""The three-optimizer collection and the reference's LR schedules.

The reference drives three optimizers with hand-written per-step LR formulas
(trainer/main.py:263-291) and steps/zeros them together through
OptimizerCollection (trainer/optimizer.py:237-275). Here the trainable
parameters live in ONE pytree with top-level groups

    {"unet": ..., "ti": [rows_te1, rows_te2], "te_lora": [...]}

and `build_optimizer(config)` returns a single optax.multi_transform whose
sub-transforms reproduce each group's optimizer + schedule. One transform =
one `opt_state` = one jitted update — no host-side LR pokes.

Schedules (reference main.py:263-291), as functions of global step with
completion_f = step / max_train_steps:
- TI (adamw):      ti_lr * (1 - f)^1.7, frozen after freeze_ti_after_completion_f
- TE LoRA (adamw): te_lr * (1 - f)^2  * min(step / warmup, 1)
- UNet:            base_lr * (unet_lr / base_lr)^(step / warmup_steps)
                   (exponential ramp from a cold base LR), frozen while
                   f < freeze_unet_before_completion_f
- prodigy groups ignore the schedule (lr = 1.0, D-adaptation does the work).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.training.prodigy import prodigy


def base_unet_lr(config: TrainingConfig) -> float:
    """Cold-start LR for the exponential UNet warmup (main.py:242-246)."""
    if not config.is_lora:
        return 1.0e-5
    return 2.0e-4 if config.disable_ti else 5.0e-5


def ti_lr_schedule(config: TrainingConfig) -> Callable:
    total = config.max_train_steps

    def schedule(step):
        f = jnp.minimum(step.astype(jnp.float32) / total, 1.0)
        lr = config.ti_lr * (1.0 - f) ** 1.7
        return jnp.where(f > config.freeze_ti_after_completion_f, 0.0, lr)

    return schedule


def te_lora_lr_schedule(config: TrainingConfig) -> Callable:
    total = config.max_train_steps
    warmup = config.txt_encoders_lr_warmup_steps

    def schedule(step):
        f = jnp.minimum(step.astype(jnp.float32) / total, 1.0)
        lr = config.text_encoder_lora_lr * (1.0 - f) ** 2.0
        if warmup > 0:
            lr = lr * jnp.minimum(step.astype(jnp.float32) / warmup, 1.0)
        return lr

    return schedule


def unet_lr_schedule(config: TrainingConfig) -> Callable:
    total = config.max_train_steps
    base = base_unet_lr(config)
    warmup = max(config.unet_lr_warmup_steps or total, 1)

    def schedule(step):
        f = jnp.minimum(step.astype(jnp.float32) / total, 1.0)
        exp_factor = (config.unet_lr / base) ** (step.astype(jnp.float32) / warmup)
        lr = base * exp_factor
        return jnp.where(f < config.freeze_unet_before_completion_f, 0.0, lr)

    return schedule


def _adamw(lr_schedule, weight_decay: float) -> optax.GradientTransformation:
    # torch AdamW defaults (the reference never overrides betas/eps for adamw)
    return optax.adamw(
        learning_rate=lr_schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def build_unet_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    wd = config.lora_weight_decay if not config.use_dora else 0.0
    if config.unet_optimizer_type == "prodigy":
        return prodigy(
            learning_rate=1.0,
            d_coef=config.prodigy_d_coef,
            growth_rate=config.unet_prodigy_growth_factor,
            weight_decay=wd,
            betas=(0.9, 0.99),
            safeguard_warmup=True,
            use_bias_correction=True,
            decouple=True,
        )
    if config.unet_optimizer_type == "AdamW8bit":
        # TPU-native equivalent of bitsandbytes AdamW8bit: block-wise int8
        # moment quantization inside the jitted step (matters for the
        # full-finetune path, where fp32 moments cost 20+ GB)
        from sd_lora_trainer_tpu.training.quantized_adam import adamw8bit

        return adamw8bit(unet_lr_schedule(config), weight_decay=wd)
    return _adamw(unet_lr_schedule(config), wd)


def build_ti_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    if config.ti_optimizer == "prodigy":
        return prodigy(
            learning_rate=1.0,
            d_coef=1.0,
            weight_decay=config.ti_weight_decay,
            betas=(0.9, 0.99),
            safeguard_warmup=True,
            use_bias_correction=True,
            decouple=True,
        )
    return _adamw(ti_lr_schedule(config), config.ti_weight_decay)


def build_te_lora_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    wd = config.text_encoder_lora_weight_decay if not config.use_dora else 0.0
    return _adamw(te_lora_lr_schedule(config), wd)


def build_optimizer(
    config: TrainingConfig, trainable_template: dict
) -> optax.GradientTransformation:
    """One multi_transform over the combined trainable tree.

    `trainable_template` is the trainable pytree (used to derive labels):
    top-level keys in {"unet", "ti", "te_lora"}; missing groups are allowed.
    """
    transforms: Dict[str, optax.GradientTransformation] = {}
    if "unet" in trainable_template:
        transforms["unet"] = build_unet_optimizer(config)
    if "ti" in trainable_template:
        transforms["ti"] = build_ti_optimizer(config)
    if "te_lora" in trainable_template:
        transforms["te_lora"] = build_te_lora_optimizer(config)

    def label_fn(tree):
        return {k: jax.tree.map(lambda _: k, v) for k, v in tree.items()}

    return optax.multi_transform(transforms, label_fn)


def current_lrs(config: TrainingConfig, step: jnp.ndarray, opt_state=None) -> Dict[str, jnp.ndarray]:
    """LR values for logging parity with OptimizerCollection's tracker."""
    out = {}
    out["unet"] = unet_lr_schedule(config)(step)
    out["textual_inversion"] = ti_lr_schedule(config)(step)
    out["text_encoders"] = te_lora_lr_schedule(config)(step)
    return out
