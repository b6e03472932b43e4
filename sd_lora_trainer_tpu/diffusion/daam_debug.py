"""DAAM attention-heatmap debug plots
(reference: trainer/ti_cross_attn_loss.py:19-83 plot_token_attention_loss).

Renders the TI tokens' spatial attention maps (stacked over layers) next to
the training mask — the visual check that the attention regularizer is
confining the concept tokens to the masked region.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from sd_lora_trainer_tpu.diffusion.losses import stack_attention_maps


def plot_token_attention_maps(
    output_dir: str,
    attn_scores: Dict[str, np.ndarray],  # name -> [B, q_len, 77]
    masks: np.ndarray,  # [B, H, W, 1]
    ti_token_positions: np.ndarray,  # [B, n_ti]
    img_ratio: float,
    global_step: int,
) -> str:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return ""
    import jax.numpy as jnp

    maps = np.asarray(
        stack_attention_maps({k: jnp.asarray(v) for k, v in attn_scores.items()}, img_ratio)
    )  # [L, B, h, w, 77]
    maps = maps.mean(axis=0)  # [B, h, w, 77]
    batch = maps.shape[0]
    n_ti = ti_token_positions.shape[1]

    fig, axes = plt.subplots(batch, n_ti + 1, figsize=(3 * (n_ti + 1), 3 * batch), squeeze=False)
    for b in range(batch):
        axes[b][0].imshow(masks[b, :, :, 0], cmap="gray")
        axes[b][0].set_title("mask", fontsize=8)
        axes[b][0].axis("off")
        for t in range(n_ti):
            pos = int(ti_token_positions[b, t])
            heat = maps[b, :, :, max(pos, 0)]
            axes[b][t + 1].imshow(heat, cmap="viridis")
            axes[b][t + 1].set_title(f"<s{t}> @ {pos}", fontsize=8)
            axes[b][t + 1].axis("off")
    os.makedirs(os.path.join(output_dir, "daam"), exist_ok=True)
    out = os.path.join(output_dir, "daam", f"token_attention_{global_step:05d}.png")
    fig.tight_layout()
    fig.savefig(out, dpi=80)
    plt.close(fig)
    return out
