"""Training configuration.

JSON-compatible with the reference trainer's config surface
(reference: trainer/config.py:38-177): same field names, same derived-default
logic (face-mode overrides, DoRA overrides, token-list generation, timestamped
output dir), so existing `train_configs/*.json` files work unchanged.

TPU-specific additions live at the bottom of the model (mesh shape, sharding
mode, remat policy); the torch-only `device: cuda:N` field is accepted for
compatibility but ignored — device selection on TPU is the mesh.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime
from typing import List, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict

from sd_lora_trainer_tpu.utils.utils import sanitize_name


class ModelPaths:
    """Mutable registry of cache directories (reference: trainer/config.py:9-26).

    Front-ends (e.g. a ComfyUI node) override these to redirect downloads into
    their own model folders.
    """

    def __init__(self):
        self.paths = {
            "BLIP": "./cache",
            "FLORENCE": "./cache",
            "CLIP": "./cache",
            "SR": "./cache",
            "SD": "./models",
        }

    def get_path(self, key):
        return self.paths.get(key, None)

    def set_path(self, key, path):
        if key in self.paths:
            self.paths[key] = path


model_paths = ModelPaths()

# Default base-checkpoint download URLs (reference: trainer/config.py:29-31).
SDXL_URL = "https://edenartlab-lfs.s3.amazonaws.com/models/checkpoints/Eden_SDXL.safetensors"
SD15_URL = "https://huggingface.co/KamCastle/jugg/resolve/main/juggernaut_reborn.safetensors"


def pretrained_models():
    return {
        "sdxl": {
            "path": os.path.join(model_paths.get_path("SD"), os.path.basename(SDXL_URL)),
            "url": SDXL_URL,
            "version": "sdxl",
        },
        "sd15": {
            "path": os.path.join(model_paths.get_path("SD"), os.path.basename(SD15_URL)),
            "url": SD15_URL,
            "version": "sd15",
        },
    }


class TrainingConfig(BaseModel):
    """Pydantic config with the reference's exact field surface.

    Reference: trainer/config.py:38-177. Fields the reference only uses on
    CUDA (`allow_tf32`, `device`, `dataloader_num_workers`) are accepted so old
    JSON files round-trip, but have no effect on TPU.
    """

    model_config = ConfigDict(extra="ignore", validate_assignment=False)

    lora_training_urls: str
    concept_mode: Literal["face", "style", "object"]
    caption_prefix: str = ""
    prompt_modifier: Optional[str] = None
    caption_model: Literal["gpt4-v", "blip", "florence", "no_caption"] = "florence"
    caption_dropout: float = 0.1
    sd_model_version: Optional[Literal["sdxl", "sd15"]] = None
    ckpt_path: Optional[str] = None
    pretrained_model: Optional[dict] = None
    seed: Optional[int] = None
    resolution: int = 512
    validation_img_size: Optional[Union[int, List[int]]] = None
    train_img_size: Optional[List[int]] = None
    train_aspect_ratio: Optional[float] = None
    train_batch_size: int = 4
    max_train_steps: int = 300
    num_train_epochs: Optional[int] = None
    checkpointing_steps: int = 10000
    gradient_accumulation_steps: int = 1
    is_lora: bool = True

    unet_optimizer_type: Literal["adamw", "prodigy", "AdamW8bit"] = "adamw"
    unet_lr_warmup_steps: Optional[int] = None
    unet_lr: float = 0.0003
    prodigy_d_coef: float = 1.0
    unet_prodigy_growth_factor: float = 1.05
    lora_weight_decay: float = 0.004

    ti_lr: float = 0.001
    token_warmup_steps: int = 0
    ti_weight_decay: float = 0.0
    ti_optimizer: Literal["adamw", "prodigy"] = "adamw"
    freeze_ti_after_completion_f: float = 0.7
    freeze_unet_before_completion_f: float = 0.0

    token_attention_loss_w: float = 3e-7
    cond_reg_w: float = 0.0e-5
    tok_cond_reg_w: float = 0.0e-5
    tok_cov_reg_w: float = 0.0
    l1_penalty: float = 0.03

    noise_offset: float = 0.02
    snr_gamma: float = 5.0
    lora_alpha_multiplier: float = 1.0
    lora_rank: int = 16
    use_dora: bool = False

    left_right_flip_augmentation: bool = True
    augment_imgs_up_to_n: int = 40
    mask_target_prompts: Optional[str] = None
    crop_based_on_salience: bool = True
    use_face_detection_instead: bool = False
    clipseg_temperature: float = 0.5
    n_sample_imgs: int = 4
    name: Optional[str] = None
    output_dir: str = "eden_lora_training_runs"
    debug: bool = False
    allow_tf32: bool = True  # no-op on TPU (accepted for JSON compatibility)
    disable_ti: bool = False
    skip_gpt_cleanup: bool = False
    weight_type: Literal["fp16", "bf16", "fp32"] = "bf16"
    n_tokens: int = 3
    inserting_list_tokens: List[str] = ["<s0>", "<s1>", "<s2>"]
    token_dict: dict = {"TOK": "<s0><s1><s2>"}
    device: str = "tpu"  # informational only; TPU placement is the mesh
    sample_imgs_lora_scale: Optional[float] = None
    dataloader_num_workers: int = 0
    training_attributes: dict = {}
    aspect_ratio_bucketing: bool = False
    start_time: float = 0.0
    job_time: float = 0.0

    # Text-encoder LoRA (enabled when text_encoder_lora_optimizer is not None,
    # reference: trainer/config.py:106-116).
    text_encoder_lora_optimizer: Optional[Literal["adamw"]] = None
    text_encoder_lora_lr: float = 1.0e-5
    txt_encoders_lr_warmup_steps: int = 200
    text_encoder_lora_weight_decay: float = 1.0e-5
    text_encoder_lora_rank: int = 16

    # ---- TPU-native extensions (not present in the reference) ----
    # Data-parallel size; 0/None = use all local devices.
    mesh_data_parallel: int = 0
    # FSDP parameter sharding for full-finetune runs ("dp" | "fsdp").
    sharding_mode: Literal["dp", "fsdp", "tp"] = "dp"
    # Tensor-parallel width for sharding_mode="tp" (2-D data x model mesh;
    # Megatron-style sharding of the UNet attention/ff projections). TP runs
    # use einsum attention (the Pallas flash kernel has no SPMD partitioner).
    mesh_model_parallel: int = 2
    # Rematerialization policy for the UNet blocks under jit: "auto" picks
    # the measured-best plan per model/resolution (main.py); True/False force
    # full/no remat; "light", "dots", "save:<names>", "offload:<names>" select
    # explicit policies (models/unet.py:unet_forward).
    remat: Union[bool, str] = "auto"
    # Comma list of checkpoint names (same grammar as the save:/offload:
    # specs, '*' expands per level) whose remat stash is quantized to
    # row-wise int8 — halves those names' HBM cost under a "save:" plan at
    # a bounded activation-precision cost (ops/stash8.py). Requires a
    # "save:"-family remat plan that lists the same names. Off by default.
    remat_stash8: str = ""
    # Store the FROZEN base UNet's matmul/conv kernels as per-output-channel
    # int8 codes + fp32 scales (models/quant.py), dequantized at use inside
    # the rematerialized blocks — frees ~2.4 GB of HBM on SDXL for richer
    # `save:` remat plans at a <=0.4%-per-weight precision cost the LoRA
    # adapters train through. LoRA-mode only (full finetune trains the base),
    # remat-on configs only (with remat off the dequantized weights stay live
    # fwd->bwd and nothing is freed); ignored under sharding_mode="tp"
    # (sharding specs pattern-match bf16 kernel shapes). "int8+te" also
    # quantizes the frozen text-encoder kernels (~0.75 GB more on SDXL) and
    # remats the conditioning forward so their dequants stay transient
    # (StepConfig.remat_te). "auto" | "none" | "int8" | "int8+te". "auto"
    # (the default) resolves via resolve_quantize_base(): int8 for SDXL LoRA
    # runs — the round-5 measured winner (BENCH_NOTES.md: int8 base +
    # light+save remat = 4.42 vs 4.17 imgs/s @1024px bs=8, 32-step loss
    # trajectory within 3.5e-4 of bf16) — and "none" everywhere the lever is
    # a no-op or a loss (SD15's remat-off plan, full finetune, tp).
    quantize_base: str = "auto"
    # Fuse attn1 q/k/v (and attn2 k/v) base kernels into single matmuls for
    # the jitted step's frozen copy (models/fuse.py). Numerics identical
    # (tests/test_fused_qkv.py); auto-disabled with DoRA (needs per-projection
    # base kernels) and under tp (sharding specs target unfused names).
    fuse_qkv: bool = True
    # Pre-compile the train step for every bucket resolution before the loop
    # (bucketed runs switch shapes mid-epoch; each shape is its own XLA
    # program and compiles can take minutes).
    prewarm_compile: bool = True
    # Run K optimizer steps per jitted call (lax.scan over a K-stacked batch):
    # amortizes per-dispatch overhead — measured +8% imgs/s on a tunneled v5e
    # at SDXL bs=8 @1024px. Falls back to 1 under aspect_ratio_bucketing
    # (shapes must be uniform within a call) and debug (per-step traces).
    # max_train_steps is rounded UP to a multiple of K.
    steps_per_call: int = 4
    # Save orbax train state for mid-run resume (the reference cannot resume).
    save_train_state: bool = False
    resume_from: Optional[str] = None
    # Internal/testing: skip output-dir creation & timestamping.
    _testing_no_output_dir: bool = False

    def __init__(self, **data):
        testing_no_output_dir = bool(data.pop("_testing_no_output_dir", False))
        super().__init__(**data)

        # Derived defaults, mirroring reference trainer/config.py:121-166.
        if not self.ckpt_path:
            if self.sd_model_version is not None:
                self.pretrained_model = pretrained_models()[self.sd_model_version]
        else:
            self.pretrained_model = {
                "path": self.ckpt_path,
                "url": None,
                "version": self.sd_model_version,
            }

        if not self.name:
            self.name = os.path.basename(self.lora_training_urls)[:40]
        self.name = sanitize_name(self.name)

        if not testing_no_output_dir:
            timestamp = datetime.now().strftime("%d%b_%H%M")
            self.output_dir = (
                self.output_dir
                + f"/{self.name}_{timestamp}-{self.concept_mode}_res{self.resolution}_{self.max_train_steps}steps"
            )
            os.makedirs(self.output_dir, exist_ok=True)

        if self.seed is None:
            self.seed = int(time.time())

        if self.unet_lr_warmup_steps is None:
            self.unet_lr_warmup_steps = self.max_train_steps

        if self.checkpointing_steps < 1:
            self.checkpointing_steps = self.max_train_steps

        if self.concept_mode == "face":
            # Face mode: no left-right flips, CLIPSeg prompt is "face"
            # (reference: trainer/config.py:147-151).
            self.left_right_flip_augmentation = False
            self.mask_target_prompts = "face"

        if self.use_dora:
            # DoRA disables L1 sparsity and weight decay
            # (reference: trainer/config.py:153-157).
            self.l1_penalty = 0.0
            self.lora_weight_decay = 0.0
            self.text_encoder_lora_weight_decay = 0.0

        inserting_list_tokens = [f"<s{i}>" for i in range(self.n_tokens)]
        self.inserting_list_tokens = inserting_list_tokens
        self.token_dict = {"TOK": "".join(inserting_list_tokens)}

        self.start_time = time.time()

    def resolve_quantize_base(self) -> str:
        """Concrete "none" | "int8" | "int8+te" for quantize_base="auto".

        "auto" promotes the round-5 measured winner (BENCH_NOTES.md round-5
        headline: int8 frozen base + `light+save:flash_out*,flash_lse*` =
        4.42 imgs/s vs the bf16 default's 4.17 @1024px bs=8; the 32-step
        loss trajectories agree within 3.5e-4 per step): int8 for SDXL LoRA
        runs, where the ~2.4 GB the int8 base frees pays for the lighter
        remat plan. Resolves to "none" wherever the lever is a no-op or a
        loss: SD15's auto plan is remat OFF at <=512px (with no remat the
        dequantized kernels stay live fwd->bwd, so int8 frees nothing and
        only adds dequant work), full finetune trains the base, and tp
        sharding specs pattern-match bf16 kernel shapes.
        """
        q = self.quantize_base
        if q == "auto":
            q = "int8" if self.sd_model_version == "sdxl" else "none"
        # The LoRA/tp guards apply to explicit requests too (main.py prints
        # the "ignoring" diagnostics for those); encoding them here keeps
        # StepConfig.from_config's remat/remat_te resolution consistent with
        # whether the base weights actually get quantized.
        if q in ("int8", "int8+te") and (
            not self.is_lora or self.sharding_mode == "tp"
        ):
            return "none"
        return q

    @classmethod
    def from_json(cls, file_path: str):
        with open(file_path, "r") as f:
            data = json.load(f)
        return cls(**data)

    def save_as_json(self, file_path: str) -> None:
        with open(file_path, "w") as f:
            json.dump(self.model_dump(), f, indent=4)
