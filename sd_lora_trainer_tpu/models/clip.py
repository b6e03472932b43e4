"""CLIP text encoders in functional JAX.

The reference delegates text encoding to transformers' CLIPTextModel(L) and
CLIPTextModelWithProjection(bigG) via `pipe.encode_prompt`
(reference: trainer/inference.py:131-177, trainer/embedding_handler.py:236-282).
We own them here: CLIP-L (SD15 + SDXL TE1) and OpenCLIP bigG (SDXL TE2) share
one implementation parameterized by `CLIPTextConfig`.

Return surface per forward:
- `last`        — final_layer_norm(hidden)  (SD15 conditioning)
- `penultimate` — hidden state *before* the last encoder layer's output... more
   precisely the output of layer N-1 with no final LN (SDXL conditioning,
   a.k.a. hidden_states[-2] / "clip skip 2")
- `pooled`      — EOT-token feature after final LN (optionally through
   text_projection) — SDXL's pooled_prompt_embeds from TE2.

Textual inversion: `ti_embeddings` [n_new, D] rows are concatenated to the
frozen token table at lookup, so new-token rows are a separate (trainable)
leaf and the base table never receives gradients — replacing the reference's
grad-zeroing trick (main.py:368-371) with a structurally-masked update.

LoRA on k/q/v/out projections (reference: trainer/optimizer.py:162) rides the
`dense` primitive: inject adapters into the param tree with models/lora.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from sd_lora_trainer_tpu.models.layers import dense, gelu, layer_norm, quick_gelu
from sd_lora_trainer_tpu.ops.attention import make_causal_mask, multihead_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # "quick_gelu" (CLIP-L) | "gelu" (bigG)
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # set for bigG (1280)


# SD1.5 / SDXL text-encoder-1: OpenAI CLIP ViT-L/14 text tower.
CLIP_L_CONFIG = CLIPTextConfig()

# SDXL text-encoder-2: OpenCLIP ViT-bigG/14 text tower.
CLIP_BIG_G_CONFIG = CLIPTextConfig(
    hidden_size=1280,
    num_layers=32,
    num_heads=20,
    intermediate_size=5120,
    hidden_act="gelu",
    projection_dim=1280,
)


def _encoder_layer(p: dict, x: jnp.ndarray, mask: jnp.ndarray, cfg: CLIPTextConfig) -> jnp.ndarray:
    act = quick_gelu if cfg.hidden_act == "quick_gelu" else gelu
    # pre-LN self-attention
    h = layer_norm(p["layer_norm1"], x)
    q = dense(p["self_attn"]["q_proj"], h)
    k = dense(p["self_attn"]["k_proj"], h)
    v = dense(p["self_attn"]["v_proj"], h)
    attn, _ = multihead_attention(q, k, v, cfg.num_heads, mask=mask)
    x = x + dense(p["self_attn"]["out_proj"], attn)
    # pre-LN MLP
    h = layer_norm(p["layer_norm2"], x)
    h = act(dense(p["mlp"]["fc1"], h))
    x = x + dense(p["mlp"]["fc2"], h)
    return x


def clip_text_forward(
    params: dict,
    input_ids: jnp.ndarray,  # [B, 77] int32
    cfg: CLIPTextConfig,
    ti_embeddings: Optional[jnp.ndarray] = None,  # [n_new, D] trainable rows
    dtype=jnp.bfloat16,
) -> dict:
    """Forward pass. See module docstring for the returned dict."""
    tm = params["text_model"]
    table = tm["embeddings"]["token_embedding"]["weight"]
    if ti_embeddings is not None:
        table = jnp.concatenate([table, ti_embeddings.astype(table.dtype)], axis=0)
    # mode="clip": jnp.take's default fill mode writes NaN for out-of-range
    # ids (e.g. TI token ids when ti_embeddings is not attached); clipping
    # keeps the forward well-defined under jit.
    x = jnp.take(table, input_ids, axis=0, mode="clip").astype(dtype)
    pos = tm["embeddings"]["position_embedding"]["weight"][: input_ids.shape[1]]
    x = x + pos.astype(dtype)

    mask = make_causal_mask(input_ids.shape[1])

    hidden = x
    penultimate = None
    layers = tm["encoder"]["layers"]
    for i, layer_params in enumerate(layers):
        if i == len(layers) - 1:
            penultimate = hidden
        hidden = _encoder_layer(layer_params, hidden, mask, cfg)
    last = layer_norm(tm["final_layer_norm"], hidden)

    # Pooled output: feature at the first EOS position. transformers takes
    # argmax of (ids == eos) — robust to TI tokens with ids > eos_token_id.
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)  # [B]
    pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]  # [B, D]
    if "text_projection" in params:
        pooled = dense(params["text_projection"], pooled)

    return {"last": last, "penultimate": penultimate, "pooled": pooled}


def init_clip_params(key: jax.Array, cfg: CLIPTextConfig, dtype=jnp.float32) -> dict:
    """Random-init params (tests / synthetic checkpoints)."""
    k = iter(jax.random.split(key, 16 + cfg.num_layers * 16))

    def lin(n_in, n_out, std=0.02):
        return {
            "kernel": jax.random.normal(next(k), (n_in, n_out), dtype) * std,
            "bias": jnp.zeros((n_out,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((cfg.hidden_size,), dtype), "bias": jnp.zeros((cfg.hidden_size,), dtype)}

    d, ffn = cfg.hidden_size, cfg.intermediate_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "layer_norm1": ln(),
                "self_attn": {
                    "q_proj": lin(d, d),
                    "k_proj": lin(d, d),
                    "v_proj": lin(d, d),
                    "out_proj": lin(d, d),
                },
                "layer_norm2": ln(),
                "mlp": {"fc1": lin(d, ffn), "fc2": lin(ffn, d)},
            }
        )
    params = {
        "text_model": {
            "embeddings": {
                "token_embedding": {
                    "weight": jax.random.normal(next(k), (cfg.vocab_size, d), dtype) * 0.014
                },
                "position_embedding": {
                    "weight": jax.random.normal(next(k), (cfg.max_position_embeddings, d), dtype)
                    * 0.01
                },
            },
            "encoder": {"layers": layers},
            "final_layer_norm": ln(),
        }
    }
    if cfg.projection_dim is not None:
        params["text_projection"] = {
            "kernel": jax.random.normal(next(k), (d, cfg.projection_dim), dtype) * 0.02
        }
    return params
