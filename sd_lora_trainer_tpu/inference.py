"""Validation rendering and from-disk inference.

TPU counterpart of trainer/inference.py: Euler-discrete sampling with
trailing spacing, CFG 8, the reference's fixed negative prompt, the
`prepare_prompt_for_lora` token-replacement policy (inference.py:40-127), and
token-scale condition blending (`blend_conditions`, inference.py:180-227)
where the trained-token prompt and a token-free "zero" prompt are encoded
separately and lerped by token_scale = lora_scale**0.4 rescaled to [0.5, 1].

Adapters are *merged* into the weights at the requested lora_scale before
sampling (models/lora.py merge_lora) — the equivalent of the reference's
set_adapter_scales — so the sampling loop runs the plain jitted UNet.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule, EulerDiscreteSampler
from sd_lora_trainer_tpu.models.clip import CLIPTextConfig, clip_text_forward
from sd_lora_trainer_tpu.models.lora import merge_lora
from sd_lora_trainer_tpu.models.unet import UNetConfig, unet_forward
from sd_lora_trainer_tpu.models.vae import VAEConfig, vae_decode_batched
from sd_lora_trainer_tpu.utils.utils import fix_prompt, replace_in_string
from sd_lora_trainer_tpu.utils.val_prompts import val_prompts

NEGATIVE_PROMPT = (
    "nude, naked, poorly drawn face, ugly, tiling, out of frame, extra limbs, "
    "disfigured, deformed body, blurry, blurred, watermark, text, grainy, "
    "signature, cut off, draft"
)


@dataclasses.dataclass
class InferencePipeline:
    """Everything needed to render: params + tokenizers + configs."""

    version: str
    unet_params: dict
    unet_config: UNetConfig
    te1_params: dict
    te1_config: CLIPTextConfig
    te2_params: Optional[dict]
    te2_config: Optional[CLIPTextConfig]
    vae_params: dict
    vae_config: VAEConfig
    tokenizer_1: object
    tokenizer_2: Optional[object]
    schedule: DDPMSchedule
    ti_rows: Optional[List[Optional[np.ndarray]]] = None


def prepare_prompt_for_lora(
    prompt: str, lora_path: str, interpolation: bool = False, verbose: bool = False
) -> str:
    """Replace <concept>/lora-name with the trigger text and TOK with the
    trained tokens (reference: trainer/inference.py:40-127)."""
    if "_no_token" in lora_path:
        return prompt

    sp_path = os.path.join(lora_path, "special_params.json")
    if not os.path.exists(sp_path):
        raise ValueError(
            "This concept is from an old lora trainer that was deprecated. "
            "Please retrain your concept for better results!"
        )
    token_map = json.load(open(sp_path))
    training_args = json.load(open(os.path.join(lora_path, "training_args.json")))
    trigger_text = training_args["training_attributes"]["trigger_text"]
    lora_name = str(training_args.get("name", "concept"))
    encapsulated = f"<{lora_name}>"
    mode = training_args.get("concept_mode", training_args.get("mode", "object"))

    if mode != "style":
        replacements = {
            "<concept>": trigger_text,
            "<concepts>": trigger_text + "'s",
            encapsulated: trigger_text,
            encapsulated.lower(): trigger_text,
            lora_name: trigger_text,
            lora_name.lower(): trigger_text,
        }
        prompt = replace_in_string(prompt, replacements)
        if trigger_text not in prompt:
            prompt = trigger_text + ", " + prompt
    else:
        style_replacements = {
            "in the style of <concept>": "in the style of TOK",
            f"in the style of {encapsulated}": "in the style of TOK",
            f"in the style of {encapsulated.lower()}": "in the style of TOK",
            f"in the style of {lora_name}": "in the style of TOK",
            f"in the style of {lora_name.lower()}": "in the style of TOK",
        }
        prompt = replace_in_string(prompt, style_replacements)
        if "in the style of TOK" not in prompt:
            prompt = "in the style of TOK, " + prompt

    prompt = replace_in_string(prompt, {"<concept>": "TOK", encapsulated: "TOK"})
    if interpolation and mode != "style":
        prompt = "TOK, " + prompt
    prompt = replace_in_string(prompt, token_map)
    prompt = fix_prompt(prompt)
    if verbose:
        print(f"Adjusted prompt for LoRA: {prompt}")
    return prompt


def compute_token_scale(lora_scale: float, power: float = 0.4, min_scale: float = 0.5) -> float:
    """token_scale = min + (1-min) * lora_scale**power (inference.py:180-205)."""
    return min_scale + (1.0 - min_scale) * (lora_scale**power)


@partial(jax.jit, static_argnames=("config",))
def _clip_fwd(params, ids, ti, config):
    """Jitted text-encoder forward — eager per-op dispatch of the 12/32-layer
    CLIP towers is seconds of pure RPC latency over a tunneled TPU."""
    return clip_text_forward(params, ids, config, ti_embeddings=ti, dtype=jnp.float32)


def _encode(pipe: InferencePipeline, prompts: List[str], resolution: Tuple[int, int]):
    """Encode a prompt batch -> (prompt_embeds, pooled, add_time_ids)."""
    ti1 = pipe.ti_rows[0] if pipe.ti_rows else None
    ids1 = jnp.asarray(pipe.tokenizer_1(prompts), jnp.int32)
    o1 = _clip_fwd(
        pipe.te1_params, ids1,
        jnp.asarray(ti1) if ti1 is not None else None, pipe.te1_config,
    )
    if pipe.version == "sd15":
        return o1["last"], None, None
    ti2 = pipe.ti_rows[1] if pipe.ti_rows and len(pipe.ti_rows) > 1 else None
    ids2 = jnp.asarray(pipe.tokenizer_2(prompts), jnp.int32)
    o2 = _clip_fwd(
        pipe.te2_params, ids2,
        jnp.asarray(ti2) if ti2 is not None else None, pipe.te2_config,
    )
    embeds = jnp.concatenate([o1["penultimate"], o2["penultimate"]], axis=-1)
    w, h = resolution
    add_time_ids = jnp.tile(
        jnp.asarray([[1024, 1024, 0, 0, h, w]], jnp.float32), (len(prompts), 1)
    )
    return embeds, o2["pooled"], add_time_ids


def encode_prompt_advanced(
    pipe: InferencePipeline,
    lora_path: Optional[str],
    prompt: str,
    negative_prompt: str,
    lora_scale: float,
    resolution: Tuple[int, int],
    token_scale: Optional[float] = None,
    concept_mode: Optional[str] = None,
    negative_cache: Optional[Tuple] = None,
):
    """Blend trained-token and token-free conditionings
    (reference: trainer/inference.py:230-286).

    `negative_cache`: precomputed (uc, puc) — callers rendering several
    prompts encode the (identical) negative prompt once instead of per call.
    """
    if lora_path and token_scale != 0:
        lora_prompt = prepare_prompt_for_lora(prompt, lora_path)
    else:
        lora_prompt = prompt
    replace_str = {"face": "person", "object": "object"}.get(concept_mode, "")
    zero_prompt = fix_prompt(prompt.replace("<concept>", replace_str))

    c2, pc2, add_ids = _encode(pipe, [lora_prompt], resolution)
    c1, pc1, _ = _encode(pipe, [zero_prompt], resolution)
    if negative_cache is not None:
        uc, puc = negative_cache
    else:
        uc, puc, _ = _encode(pipe, [negative_prompt], resolution)

    if token_scale is None:
        token_scale = compute_token_scale(lora_scale)
    c = (1 - token_scale) * c1 + token_scale * c2
    pc = None if pc1 is None else (1 - token_scale) * pc1 + token_scale * pc2
    return c, uc, pc, puc, add_ids


@partial(
    jax.jit,
    static_argnames=(
        "pipe_static", "num_inference_steps", "guidance_scale",
        "compute_dtype", "use_flash",
    ),
)
def _sample(
    pipe_static,
    unet_params,
    latents,
    c,
    uc,
    pc,
    puc,
    add_ids,
    num_inference_steps,
    guidance_scale,
    compute_dtype=jnp.bfloat16,
    use_flash=True,
):
    """Jitted CFG Euler sampling loop + VAE decode."""
    unet_config, version, schedule_tuple = pipe_static
    schedule = DDPMSchedule.create()
    sampler = EulerDiscreteSampler(schedule)
    sigmas, timesteps = sampler.sigmas_and_timesteps(num_inference_steps)
    x = latents * sampler.init_noise_sigma(num_inference_steps).astype(latents.dtype)

    # Mixed precision: Euler/scheduler arithmetic stays fp32 (x, sigmas, the
    # CFG combine), the UNet forward runs `compute_dtype` (default bf16 so
    # matmuls/convs hit the MXU at full rate; precision-sensitive eval callers
    # can request fp32 + no flash for the exact reference-precision path).
    ctx = jnp.concatenate([uc, c], axis=0).astype(compute_dtype)
    if version == "sdxl":
        added = {
            "text_embeds": jnp.concatenate([puc, pc], axis=0).astype(compute_dtype),
            "time_ids": jnp.concatenate([add_ids, add_ids], axis=0),
        }
    else:
        added = None

    def body(x, inp):
        sigma, sigma_next, t = inp
        x_in = sampler.scale_model_input(x, sigma)
        both = jnp.concatenate([x_in, x_in], axis=0).astype(compute_dtype)
        eps, _ = unet_forward(
            unet_params,
            both,
            jnp.full((both.shape[0],), t),
            ctx,
            unet_config,
            added_cond=added,
            capture_attn=False,
            use_flash=use_flash,
            remat=False,
        )
        eps = eps.astype(jnp.float32)
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        x = sampler.step(eps, sigma, sigma_next, x)
        return x, None

    x, _ = jax.lax.scan(body, x, (sigmas[:-1], sigmas[1:], timesteps))
    return x


def render_images_eval(
    base_checkpoint_path: str,
    lora_save_path: str,
    render_size: Tuple[int, int],
    seed: int = 0,
    lora_scale: float = 0.75,
    n_imgs: int = 4,
    n_steps: int = 25,
    dtype=None,
    precision: str = "bf16",
) -> List[str]:
    """Standalone from-disk eval rendering (reference: trainer/inference.py:
    409-493 render_images_eval): rebuild the pipeline from the base
    checkpoint, load the trained adapters + TI rows, render.
    """
    import jax.numpy as _jnp

    from sd_lora_trainer_tpu.checkpoint import load_checkpoint
    from sd_lora_trainer_tpu.models.weights import load_models_from_checkpoint

    loaded = load_models_from_checkpoint(
        base_checkpoint_path, dtype=dtype or _jnp.bfloat16
    )
    from sd_lora_trainer_tpu.main import build_tokenizers

    tok1, tok2 = build_tokenizers(loaded)
    ckpt = load_checkpoint(
        lora_save_path, loaded.unet, [loaded.text_encoder, loaded.text_encoder_2]
    )
    n_tokens = ckpt["ti_rows"][0].shape[0] if ckpt["ti_rows"][0] is not None else 0
    toks = [f"<s{i}>" for i in range(n_tokens)]
    for tok in (tok1, tok2):
        if tok is not None and toks:
            tok.add_special_tokens(toks)
    pipe = InferencePipeline(
        version=loaded.version,
        unet_params=loaded.unet,
        unet_config=loaded.unet_config,
        te1_params=loaded.text_encoder,
        te1_config=loaded.text_encoder_config,
        te2_params=loaded.text_encoder_2,
        te2_config=loaded.text_encoder_2_config,
        vae_params=loaded.vae,
        vae_config=loaded.vae_config,
        tokenizer_1=tok1,
        tokenizer_2=tok2,
        schedule=DDPMSchedule.create(),
        ti_rows=ckpt["ti_rows"],
    )
    return render_images(
        pipe,
        render_size=render_size,
        lora_path=lora_save_path,
        train_step=0,
        seed=seed,
        lora_scale=lora_scale,
        n_imgs=n_imgs,
        n_steps=n_steps,
        unet_lora=ckpt["unet_lora"],
        te_loras=ckpt["te_loras"],
        precision=precision,
    )


def render_images(
    pipe: InferencePipeline,
    render_size: Tuple[int, int],
    lora_path: str,
    train_step: int,
    seed: int,
    lora_scale: float = 0.75,
    disable_ti: bool = False,
    prompt_modifier: Optional[str] = None,
    n_steps: int = 25,
    n_imgs: int = 4,
    unet_lora: Optional[dict] = None,
    te_loras: Optional[List[Optional[dict]]] = None,
    precision: str = "bf16",
) -> List[str]:
    """Render validation images (reference: trainer/inference.py:290-407).

    Adapters (if given) are merged at lora_scale; prompt selection follows the
    reference policy (first prompt is ""/"<concept>" per mode)."""
    random.seed(seed)
    training_args = json.load(open(os.path.join(lora_path, "training_args.json")))
    concept_mode = training_args["concept_mode"]

    bank = val_prompts[concept_mode]
    prompts = random.sample(bank, min(n_imgs, len(bank)))
    while len(prompts) < n_imgs:
        prompts.append(random.choice(bank))
    prompts[0] = "" if concept_mode == "style" else "<concept>"
    if prompt_modifier:
        prompts = [prompt_modifier.format(p) for p in prompts]

    # merge adapters at the requested scale
    unet_params = pipe.unet_params
    if unet_lora is not None:
        unet_params = merge_lora(unet_params, unet_lora, scale=lora_scale)
    te1_params, te2_params = pipe.te1_params, pipe.te2_params
    if te_loras:
        if te_loras[0] is not None:
            te1_params = merge_lora(te1_params, te_loras[0], scale=lora_scale)
        if len(te_loras) > 1 and te_loras[1] is not None and te2_params is not None:
            te2_params = merge_lora(te2_params, te_loras[1], scale=lora_scale)
    pipe = dataclasses.replace(pipe, unet_params=unet_params, te1_params=te1_params, te2_params=te2_params)

    w, h = int(render_size[0]), int(render_size[1])
    factor = 2 ** (len(pipe.vae_config.block_out_channels) - 1)
    lw, lh = w // factor, h // factor

    key = jax.random.PRNGKey(seed)
    pipe_static = (pipe.unet_config, pipe.version, None)

    # Batch ALL prompts into one sampling call: the CFG UNet forward runs at
    # batch 2n instead of n sequential batch-2 calls — much better MXU
    # utilization, identical per-prompt results (conditioning and the initial
    # latent are still drawn per prompt).
    cs, pcs, latents_list = [], [], []
    add_ids = None
    uc, puc, _ = _encode(pipe, [NEGATIVE_PROMPT], (w, h))  # shared across prompts
    for prompt in prompts:
        c, uc, pc, puc, add_ids = encode_prompt_advanced(
            pipe, lora_path, prompt, NEGATIVE_PROMPT, lora_scale, (w, h),
            token_scale=0 if disable_ti else None, concept_mode=concept_mode,
            negative_cache=(uc, puc),
        )
        cs.append(c)
        pcs.append(pc)
        key, sub = jax.random.split(key)
        latents_list.append(jax.random.normal(sub, (1, lh, lw, 4), jnp.float32))
    n = len(prompts)
    c = jnp.concatenate(cs, axis=0)
    uc = jnp.tile(uc, (n, 1, 1))
    pc = None if pcs[0] is None else jnp.concatenate(pcs, axis=0)
    puc = None if puc is None else jnp.tile(puc, (n, 1))
    add_ids = None if add_ids is None else jnp.tile(add_ids, (n, 1))
    latents = jnp.concatenate(latents_list, axis=0)

    # NOTE: qkv/kv projection fusion is deliberately NOT applied here —
    # measured on the fwd-only CFG sampler it LOSES ~2% (3.09 vs 3.03 s/img
    # @1024px batch-4); the fusion win is specific to the train step's
    # fwd+bwd+remat profile (BENCH_NOTES.md round 4).
    # precision="fp32" gives the numerically conservative path (fp32 UNet,
    # einsum attention) for precision-sensitive eval; default bf16+flash.
    z = _sample(
        pipe_static, pipe.unet_params, latents, c, uc, pc, puc, add_ids,
        n_steps, 8.0,
        compute_dtype=jnp.float32 if precision == "fp32" else jnp.bfloat16,
        use_flash=precision != "fp32",
    )
    from PIL import Image

    # Decode the whole render batch in ONE call (models/vae.py:
    # vae_decode_batched): lax.map chunks the batch so each step stays
    # within the measured-safe 1024px-image activation footprint (a plain
    # batch-4 decode at 1024px OOMs 16 GB HBM) — bit-exact, zero redundant
    # work, one dispatch; >1024px single images fall back to spatial tiling.
    imgs = jax.jit(
        lambda zz: vae_decode_batched(
            pipe.vae_params, zz.astype(jnp.bfloat16), pipe.vae_config
        )
    )(z)
    imgs = np.asarray((jnp.clip(imgs.astype(jnp.float32), -1, 1) + 1) * 127.5).astype(np.uint8)
    for i in range(n):
        Image.fromarray(imgs[i]).save(
            os.path.join(lora_path, f"img_{train_step:04d}_{i}.jpg"), quality=95
        )
    return prompts
