"""TPU-native Stable Diffusion LoRA / textual-inversion trainer.

A brand-new JAX / XLA / pjit / Pallas framework with the capabilities of
edenartlab/sd-lora-trainer (reference mounted at /root/reference): concept
personalization of SD1.5 / SDXL via LoRA / DoRA adapters, textual inversion
(with cross-attention DAAM regularization), and full UNet finetuning — with the
same JSON config surface and the same export contract (kohya-format LoRA
safetensors, clip_l/clip_g TI embeddings, special_params.json).

Unlike the PyTorch reference, the whole hot path (text-encoder forward, UNet
forward/backward through LoRA-injected matmuls, three optimizers, embedding-row
masking) is a single jitted function sharded over a `jax.sharding.Mesh`
(data-parallel for LoRA runs, FSDP for full finetune).
"""

__version__ = "0.1.0"
