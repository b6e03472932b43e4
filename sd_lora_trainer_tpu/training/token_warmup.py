"""Textual-inversion token warmup (text-only pre-optimization).

Equivalent of `pre_optimize_token_embeddings`
(reference: trainer/embedding_handler.py:321-399): before image training,
optimize the new token rows so that encoding "<s0><s1><s2>" lands near the
encoding of the GPT concept description — using only text-encoder forwards:

    loss = 0.2 * [ mse(c, c*) + (1 - cos(c, c*))
                   + 0.25 * (mse(pooled, pooled*) + (1 - cos(pooled, pooled*))) ]
           + token std regularizer (w=0.5) + optional covariance regularizer

Runs as one jitted AdamW loop over the TI rows (the frozen encoders and the
precomputed target conditionings are jit arguments).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from sd_lora_trainer_tpu.diffusion.losses import DistributionLossTargets
from sd_lora_trainer_tpu.models.clip import CLIPTextConfig, clip_text_forward


def _embed_cosine_losses(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean((pred - target) ** 2)
    cos = jnp.sum(pred * target, axis=-1) / (
        jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1) + 1e-8
    )
    return mse + (1.0 - cos.mean())


def warmup_token_embeddings(
    ti_rows: Dict[str, jnp.ndarray],  # {"te1": rows, "te2": rows?}
    te_params: Dict[str, dict],
    te_configs: Dict[str, CLIPTextConfig],
    version: str,
    token_ids: Dict[str, jnp.ndarray],  # [1, 77] tokenized "<s0><s1><s2>"
    target_ids: Dict[str, jnp.ndarray],  # [1, 77] tokenized concept description
    distribution_targets: Dict[str, DistributionLossTargets],
    steps: int,
    ti_lr: float,
    ti_weight_decay: float = 0.0,
    tok_cov_reg_w: float = 0.0,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, list]]:
    """Returns (warmed ti_rows, loss history)."""
    if steps <= 0:
        return ti_rows, {}

    def conditioning(rows: Dict[str, jnp.ndarray], ids: Dict[str, jnp.ndarray], use_ti: bool):
        outs = {}
        for which in te_params:
            outs[which] = clip_text_forward(
                te_params[which],
                ids[which],
                te_configs[which],
                ti_embeddings=rows.get(which) if use_ti else None,
                dtype=jnp.float32,
            )
        if version == "sdxl":
            c = jnp.concatenate([outs["te1"]["penultimate"], outs["te2"]["penultimate"]], -1)
            pooled = outs["te2"]["pooled"]
        else:
            c = outs["te1"]["last"]
            pooled = None
        return c, pooled

    # targets are encoded once, without TI rows (plain description text)
    target_c, target_pooled = conditioning(ti_rows, target_ids, use_ti=False)

    optimizer = optax.adamw(learning_rate=ti_lr, weight_decay=ti_weight_decay)
    opt_state = optimizer.init(ti_rows)

    def loss_fn(rows):
        c, pooled = conditioning(rows, token_ids, use_ti=True)
        loss = _embed_cosine_losses(c, target_c)
        if pooled is not None and target_pooled is not None:
            loss = loss + 0.25 * _embed_cosine_losses(pooled, target_pooled)
        loss = 0.2 * loss
        aux = {"concept_description_loss": loss}
        # std regularizer at w=0.5 (reference passes std_loss_w=0.5 here)
        std_losses = [
            distribution_targets[w].std_loss(r) for w, r in rows.items() if w in distribution_targets
        ]
        if std_losses:
            stdl = jnp.mean(jnp.stack(std_losses))
            loss = loss + 0.5 * stdl
            aux["token_std_loss"] = stdl
        if tok_cov_reg_w > 0.0:
            cov_losses = [
                distribution_targets[w].covariance_loss(r)
                for w, r in rows.items()
                if w in distribution_targets
            ]
            if cov_losses:
                cov = jnp.mean(jnp.stack(cov_losses))
                loss = loss + tok_cov_reg_w * cov
                aux["covariance_tok_reg_loss"] = cov
        return loss, aux

    @jax.jit
    def step(rows, opt_state):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(rows)
        updates, opt_state = optimizer.update(grads, opt_state, rows)
        rows = optax.apply_updates(rows, updates)
        return rows, opt_state, aux

    history: Dict[str, list] = {}
    for _ in range(steps):
        ti_rows, opt_state, aux = step(ti_rows, opt_state)
    for k, v in aux.items():
        history.setdefault(k, []).append(float(v))
    return ti_rows, history
