"""Textual-inversion token engine.

Functional counterpart of the reference's TokenEmbeddingsHandler
(trainer/embedding_handler.py): inserts `<s0>..<sN>` tokens into the
tokenizers and materializes the *new rows only* as a trainable pytree. The
frozen embedding tables never see gradients by construction — the clean
replacement for the reference's "zero the gradient rows" trick
(trainer/main.py:368-371) inside a jitted step.

Export format parity: `{name}_{version}_embeddings.safetensors` with keys
"clip_l" (and "clip_g" for SDXL) holding the [n_tokens, D] rows
(reference: trainer/embedding_handler.py:401-422).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.diffusion.losses import DistributionLossTargets
from sd_lora_trainer_tpu.models.tokenizer import CLIPTokenizer

TXT_ENCODER_KEYS = ["clip_l", "clip_g"]


@dataclasses.dataclass
class TokenEmbeddingsHandler:
    tokenizers: List[Optional[CLIPTokenizer]]
    inserting_toks: List[str] = dataclasses.field(default_factory=list)
    train_ids: Optional[List[int]] = None
    # per-encoder stats for regularizers / diagnostics
    std_token_embedding: Dict[int, float] = dataclasses.field(default_factory=dict)
    distribution_targets: Dict[int, DistributionLossTargets] = dataclasses.field(
        default_factory=dict
    )

    def initialize_new_tokens(
        self,
        token_tables: List[Optional[jnp.ndarray]],  # frozen [V, D] per encoder
        inserting_toks: List[str],
        key: jax.Array,
        starting_rows: Optional[List[jnp.ndarray]] = None,
    ) -> List[Optional[jnp.ndarray]]:
        """Register tokens + return trainable rows per encoder.

        Random init draws N(0,1) rows rescaled so each row's std matches the
        pretrained table's mean per-row std (reference:
        trainer/embedding_handler.py:207-215). Returns [rows_te_i or None].
        """
        self.inserting_toks = list(inserting_toks)
        ti_rows: List[Optional[jnp.ndarray]] = []
        for idx, (tokenizer, table) in enumerate(zip(self.tokenizers, token_tables)):
            if tokenizer is None or table is None:
                ti_rows.append(None)
                continue
            tokenizer.add_special_tokens(self.inserting_toks)
            self.train_ids = tokenizer.convert_tokens_to_ids(self.inserting_toks)

            tablef = table.astype(jnp.float32)
            std_target = float(tablef.std(axis=1).mean())
            self.std_token_embedding[idx] = std_target
            self.distribution_targets[idx] = DistributionLossTargets.from_embeddings(tablef)

            if starting_rows is not None:
                rows = starting_rows[idx].astype(jnp.float32)
            else:
                k = jax.random.fold_in(key, idx)
                rows = jax.random.normal(k, (len(self.inserting_toks), table.shape[1]), jnp.float32)
                current_std = rows.std(axis=1).mean()
                rows = rows * std_target / current_std
            ti_rows.append(rows)
        return ti_rows

    # -- artifact I/O -------------------------------------------------------

    def save_embeddings(self, ti_rows: List[Optional[jnp.ndarray]], file_path: str) -> None:
        from sd_lora_trainer_tpu.utils.safetensors_io import save_safetensors

        assert self.train_ids is not None, "Initialize new tokens before saving embeddings."
        tensors = {}
        for idx, rows in enumerate(ti_rows):
            if rows is None:
                continue
            tensors[TXT_ENCODER_KEYS[idx]] = np.asarray(rows, np.float32)
        save_safetensors(tensors, file_path)

    @staticmethod
    def load_embeddings(file_path: str) -> Dict[str, np.ndarray]:
        from sd_lora_trainer_tpu.utils.safetensors_io import load_safetensors

        sd = load_safetensors(file_path)
        out = {}
        for idx, key in enumerate(TXT_ENCODER_KEYS):
            if key in sd:
                out[key] = sd[key]
            elif f"text_encoders_{idx}" in sd:  # legacy key fallback (embedding_handler.py:455)
                out[key] = sd[f"text_encoders_{idx}"]
        return out

    # -- diagnostics ---------------------------------------------------------

    @staticmethod
    def nearest_tokens(
        rows: jnp.ndarray,  # [n, D] trained TI rows
        table: jnp.ndarray,  # [V, D] frozen vocab table
        tokenizer: CLIPTokenizer,
        k: int = 5,
    ) -> List[List[str]]:
        """k nearest vocab tokens (cosine) per trained row — the reference's
        token-neighbor printout (embedding_handler.py:89-133)."""
        rowsf = rows.astype(jnp.float32)
        tablef = table.astype(jnp.float32)
        rn = rowsf / (jnp.linalg.norm(rowsf, axis=1, keepdims=True) + 1e-8)
        tn = tablef / (jnp.linalg.norm(tablef, axis=1, keepdims=True) + 1e-8)
        sims = rn @ tn.T  # [n, V]
        top = np.asarray(jnp.argsort(-sims, axis=1)[:, :k])
        decoder = {v: t for t, v in tokenizer.encoder.items()}
        return [[decoder.get(int(i), "?") for i in row] for row in top]

    def print_token_info(
        self, ti_rows: List[Optional[jnp.ndarray]], token_tables: List[Optional[jnp.ndarray]]
    ) -> None:
        """Std + nearest neighbors per encoder (embedding_handler print_token_info)."""
        for idx, (rows, table) in enumerate(zip(ti_rows, token_tables)):
            if rows is None or table is None or self.tokenizers[idx] is None:
                continue
            stds = np.asarray(jnp.asarray(rows).astype(jnp.float32).std(axis=1))
            neighbors = self.nearest_tokens(jnp.asarray(rows), table, self.tokenizers[idx])
            for i, tok in enumerate(self.inserting_toks):
                print(
                    f"  te{idx+1} {tok}: std={stds[i]:.4f} "
                    f"(target {self.std_token_embedding.get(idx, 0):.4f}) "
                    f"neighbors={neighbors[i]}"
                )

    # -- caption analysis for the DAAM loss ---------------------------------

    def ti_token_positions(self, caption: str, tokenizer_idx: int = 0, max_len: int = 77):
        """(token_count, [positions of each TI token or -1]) for one caption —
        the host-side analysis feeding `token_attention_loss`
        (reference: trainer/loss.py:33-42)."""
        tokenizer = self.tokenizers[tokenizer_idx]
        ids = tokenizer.encode(caption)
        positions = []
        for tid in self.train_ids:
            try:
                positions.append(ids.index(tid))
            except ValueError:
                positions.append(-1)
        return len(ids), positions
