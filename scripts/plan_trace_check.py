"""Zero-FLOP validation of the round-4 remat/stash8 plan queue.

jax.eval_shape-traces the FULL-SIZE SDXL 1024px bs=8 train step (fwd+bwd+
optimizer) under every plan scripts/r4_bench_queue.sh will measure — any
policy-spec typo, tag mismatch, or shape error surfaces here in ~1 min on
CPU instead of wasting a ~5-min server-side TPU compile per plan. The flash
kernel itself is exercised separately (tests/test_flash_padded.py interpret
mode); this traces the einsum path, which shares all tags except flash_*.
"""

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.diffusion.losses import DistributionLossTargets
from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule
from sd_lora_trainer_tpu.models.clip import CLIP_BIG_G_CONFIG, CLIP_L_CONFIG, init_clip_params
from sd_lora_trainer_tpu.models.lora import UNET_TARGETS, create_lora_params
from sd_lora_trainer_tpu.models.unet import SDXL_UNET_CONFIG, init_unet_params
from sd_lora_trainer_tpu.training.optimizers import build_optimizer
from sd_lora_trainer_tpu.training.step import FrozenModels, StepConfig, TrainState, make_train_step

B, RES = 8, 1024
lat = RES // 8
key = jax.random.PRNGKey(0)

def build_frozen():
    unet = init_unet_params(key, SDXL_UNET_CONFIG, dtype=jnp.bfloat16)
    te1 = init_clip_params(key, CLIP_L_CONFIG, dtype=jnp.bfloat16)
    te2 = init_clip_params(key, CLIP_BIG_G_CONFIG, dtype=jnp.bfloat16)
    return FrozenModels(
        unet_params=unet, unet_config=SDXL_UNET_CONFIG,
        te1_params=te1, te1_config=CLIP_L_CONFIG,
        te2_params=te2, te2_config=CLIP_BIG_G_CONFIG,
        schedule=DDPMSchedule.create(), version="sdxl",
        resolution=(RES, RES),
        distribution_targets={
            "te1": DistributionLossTargets.from_embeddings(
                te1["text_model"]["embeddings"]["token_embedding"]["weight"]),
            "te2": DistributionLossTargets.from_embeddings(
                te2["text_model"]["embeddings"]["token_embedding"]["weight"]),
        },
    )

frozen_sh = jax.eval_shape(build_frozen)
config = TrainingConfig(
    lora_training_urls="x", concept_mode="style", sd_model_version="sdxl",
    max_train_steps=400, lora_rank=16, train_batch_size=B, resolution=RES,
    _testing_no_output_dir=True,
)

def build_trainable():
    return {
        "unet": create_lora_params(key, frozen_sh.unet_params, rank=16, targets=UNET_TARGETS),
        "ti": {"te1": jnp.zeros((3, 768)), "te2": jnp.zeros((3, 1280))},
    }

trainable_sh = jax.eval_shape(build_trainable)
optimizer = build_optimizer(config, trainable_sh)
state_sh = jax.eval_shape(lambda: TrainState(
    step=jnp.zeros((), jnp.int32), trainable=trainable_sh,
    opt_state=optimizer.init(trainable_sh), key=jax.random.PRNGKey(1)))

ids = jnp.zeros((1, B, 77), jnp.int32)
batch_sh = jax.eval_shape(lambda: {
    "latent_mean": jnp.zeros((1, B, lat, lat, 4), jnp.bfloat16),
    "latent_logvar": jnp.zeros((1, B, lat, lat, 4), jnp.bfloat16),
    "mask": jnp.zeros((1, B, lat, lat, 1), jnp.bfloat16),
    "input_ids": ids, "input_ids_2": ids,
    "caption_token_lengths": jnp.zeros((1, B), jnp.int32),
    "ti_token_positions": jnp.zeros((1, B, 3), jnp.int32),
    "latent_scale": jnp.float32(0.13025),
})

from sd_lora_trainer_tpu.models.quant import quantize_base_weights

def build_frozen_q():
    f = build_frozen()
    return dataclasses.replace(f, unet_params=quantize_base_weights(f.unet_params))

frozen_q_sh = jax.eval_shape(build_frozen_q)

# (remat, stash8, baseq) — mirror scripts/r4_bench_queue.sh
PLANS = [
    ("save:flash_out*,flash_lse*", "", False),
    ("light+save:flash_out*,flash_lse*", "", False),
    ("save:flash_out*,flash_lse*", "flash_out*", False),
    ("save:flash_out*,flash_lse*,xattn_out_c1280", "flash_out*,xattn_out_c1280", False),
    ("save:flash_out*,flash_lse*,xattn_out*", "flash_out*,xattn_out*", False),
    ("light+save:flash_out*,flash_lse*", "flash_out*", False),
    # int8 frozen base (models/quant.py) + the plans its freed HBM unlocks
    ("save:flash_out*,flash_lse*", "", True),
    ("save:flash_out*,flash_lse*,xattn_out*", "", True),
    ("save:flash_out*,flash_lse*,xattn_out*,attn_out*", "", True),
    ("light+save:flash_out*,flash_lse*", "", True),
    ("save:flash_out*,flash_lse*,xattn_out*,ff_hidden_c1280", "ff_hidden_c1280", True),
]
sc0 = StepConfig.from_config(config, 1.0)
for remat, stash8, baseq in PLANS:
    sc = dataclasses.replace(sc0, remat=remat, stash8=stash8, use_flash=False)
    step = make_train_step(sc, optimizer)
    out = jax.eval_shape(step, state_sh, batch_sh, frozen_q_sh if baseq else frozen_sh)
    print(f"OK  remat={remat!r} stash8={stash8!r} baseq={baseq}")

# int8+te: TEs quantized too, conditioning rematerialized (remat_te)
def build_frozen_qte():
    f = build_frozen_q()
    return dataclasses.replace(
        f,
        te1_params=quantize_base_weights(f.te1_params),
        te2_params=quantize_base_weights(f.te2_params),
    )

frozen_qte_sh = jax.eval_shape(build_frozen_qte)
for remat in ("save:flash_out*,flash_lse*,xattn_out*,attn_out*",):
    sc = dataclasses.replace(sc0, remat=remat, stash8="", use_flash=False, remat_te=True)
    step = make_train_step(sc, optimizer)
    jax.eval_shape(step, state_sh, batch_sh, frozen_qte_sh)
    print(f"OK  remat={remat!r} baseq=int8+te remat_te=True")
print("ALL PLANS TRACE at full SDXL 1024px bs=8")
