"""Prompt conditioning: tokenized captions -> UNet conditioning tensors.

The TPU equivalent of `get_conditioning_signals`
(reference: trainer/embedding_handler.py:236-282, duplicated at
trainer/inference.py:131-177): SD15 conditions on CLIP-L's final hidden state;
SDXL concatenates both encoders' penultimate states, takes the pooled
projection from TE2, and appends micro-conditioning add_time_ids with the
reference's deliberate `original_size=(1024,1024)` hardcode
(embedding_handler.py:261 — "I get better results hardcoding").

This is a pure device function of (params, ti_rows, input_id arrays) so it
lives inside the jitted train step and gradients flow into TI rows / TE LoRA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from sd_lora_trainer_tpu.models.clip import CLIPTextConfig, clip_text_forward


def sd15_conditioning(
    te1_params: dict,
    input_ids: jnp.ndarray,  # [B, 77]
    cfg: CLIPTextConfig,
    ti_rows: Optional[jnp.ndarray] = None,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, None, None]:
    out = clip_text_forward(te1_params, input_ids, cfg, ti_embeddings=ti_rows, dtype=dtype)
    return out["last"], None, None


def sdxl_conditioning(
    te1_params: dict,
    te2_params: dict,
    input_ids_1: jnp.ndarray,  # [B, 77] CLIP-L ids
    input_ids_2: jnp.ndarray,  # [B, 77] CLIP-G ids
    cfg1: CLIPTextConfig,
    cfg2: CLIPTextConfig,
    resolution: Tuple[int, int],
    ti_rows_1: Optional[jnp.ndarray] = None,
    ti_rows_2: Optional[jnp.ndarray] = None,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (prompt_embeds [B,77,2048], pooled [B,1280], add_time_ids [B,6])."""
    o1 = clip_text_forward(te1_params, input_ids_1, cfg1, ti_embeddings=ti_rows_1, dtype=dtype)
    o2 = clip_text_forward(te2_params, input_ids_2, cfg2, ti_embeddings=ti_rows_2, dtype=dtype)
    prompt_embeds = jnp.concatenate([o1["penultimate"], o2["penultimate"]], axis=-1)
    pooled = o2["pooled"]
    b = input_ids_1.shape[0]
    # (orig_h, orig_w, crop_top, crop_left, target_h, target_w); original size
    # deliberately hardcoded to 1024 (reference embedding_handler.py:259-262)
    add_time_ids = jnp.tile(
        jnp.asarray([[1024, 1024, 0, 0, resolution[1], resolution[0]]], jnp.float32), (b, 1)
    )
    return prompt_embeds, pooled, add_time_ids
