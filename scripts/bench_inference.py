"""Inference (validation-render) throughput: full SDXL Euler CFG sampling.

Measures the jitted `_sample` loop (2x-batched CFG UNet forwards per step +
VAE decode) that validation rendering uses — the inference-side counterpart
of bench.py. Prints one JSON line.

Env: BENCH_RES (default 1024), BENCH_STEPS_DIFFUSION (default 25),
BENCH_IMGS (default 4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    resolution = int(os.environ.get("BENCH_RES", "1024"))
    n_steps = int(os.environ.get("BENCH_STEPS_DIFFUSION", "25"))
    n_imgs = int(os.environ.get("BENCH_IMGS", "4"))
    # batch: how many images per sampling call. render_images batches ALL
    # validation prompts into one call, so the product path is batch=n_imgs.
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    latent = resolution // 8

    from sd_lora_trainer_tpu.inference import _sample
    from sd_lora_trainer_tpu.models.unet import SDXL_UNET_CONFIG, init_unet_params
    from sd_lora_trainer_tpu.models.vae import (
        SDXL_VAE_CONFIG,
        init_vae_params,
        vae_decode_batched,
    )

    key = jax.random.PRNGKey(0)
    print(f"[bench-inf] init SDXL unet+vae ({resolution}px, {n_steps} steps)...", flush=True)
    unet = jax.jit(lambda k: init_unet_params(k, SDXL_UNET_CONFIG, dtype=jnp.bfloat16))(key)
    from sd_lora_trainer_tpu.models.fuse import fuse_attention_projections

    if os.environ.get("BENCH_INF_FUSE", "0") == "1":  # measured loser on the fwd-only sampler
        unet = fuse_attention_projections(unet)  # mirrors render_images
    vae = jax.jit(lambda k: init_vae_params(k, SDXL_VAE_CONFIG, dtype=jnp.bfloat16))(
        jax.random.fold_in(key, 1)
    )
    jax.block_until_ready(unet)

    c = jax.random.normal(jax.random.fold_in(key, 2), (batch, 77, 2048), jnp.float32)
    uc = jax.random.normal(jax.random.fold_in(key, 3), (batch, 77, 2048), jnp.float32)
    pc = jax.random.normal(jax.random.fold_in(key, 4), (batch, 1280), jnp.float32)
    puc = jax.random.normal(jax.random.fold_in(key, 5), (batch, 1280), jnp.float32)
    add_ids = jnp.tile(
        jnp.asarray([[1024, 1024, 0, 0, resolution, resolution]], jnp.float32), (batch, 1)
    )
    latents = jax.random.normal(
        jax.random.fold_in(key, 6), (batch, latent, latent, 4), jnp.float32
    )
    pipe_static = (SDXL_UNET_CONFIG, "sdxl", None)
    # memory-capped batch decode (models/vae.py): lax.map chunks the batch
    # to the safe per-step footprint — bit-exact, zero redundancy, one
    # dispatch (a plain batch-4 1024px decode OOMs 16G HBM)
    decode = jax.jit(
        lambda z: vae_decode_batched(vae, z.astype(jnp.bfloat16), SDXL_VAE_CONFIG)
    )

    print(f"[bench-inf] compiling (batch={batch})...", flush=True)
    t0 = time.time()
    z = _sample(pipe_static, unet, latents, c, uc, pc, puc, add_ids, n_steps, 8.0)
    img = decode(z)
    val = float(jnp.sum(img.astype(jnp.float32)))
    print(f"[bench-inf] compile+first render {time.time() - t0:.1f}s (chk {val:.1f})", flush=True)

    n_calls = max(n_imgs // batch, 1)
    t0 = time.time()
    for _ in range(n_calls):
        z = _sample(pipe_static, unet, latents, c, uc, pc, puc, add_ids, n_steps, 8.0)
        img = decode(z)
    float(jnp.sum(img.astype(jnp.float32)))  # hard sync
    dt = time.time() - t0

    per_img = dt / (n_calls * batch)
    print(
        f"[bench-inf] {n_calls} call(s) x batch {batch} in {dt:.2f}s -> {per_img:.2f} s/img",
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": f"sdxl_render_seconds_per_image_{resolution}px_{n_steps}steps_batch{batch}",
                "value": round(per_img, 3),
                "unit": "s/img",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
