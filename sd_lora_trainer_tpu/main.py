"""The training orchestrator: `train(config) -> generator`.

Mirrors the reference's public entry (trainer/main.py:34-551): loads the base
checkpoint, runs dataset preprocessing once, initializes TI tokens + adapters
+ the three-group optimizer, then drives the epoch/step loop — yielding
progress floats for front-ends (cog/ComfyUI consume the generator,
predict.py:156-163, node.py:101-111) and returning (config, output_dir).

The hot loop is ONE jitted step (training/step.py). The host side of each
iteration is only: batch index selection, caption dropout, tokenization, and
DAAM caption analysis — everything tensor-shaped happens on device.

Note on step accounting: `max_train_steps` counts optimizer steps; with
gradient_accumulation_steps=N each step consumes N micro-batches (the
reference counts micro-batches and steps on boundaries, main.py:362-382 —
identical behavior at the default N=1).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import shutil
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.checkpoint import save_checkpoint, save_train_state
from sd_lora_trainer_tpu.config import TrainingConfig, model_paths
from sd_lora_trainer_tpu.data.dataset import LatentDataset
from sd_lora_trainer_tpu.data.io import make_validation_img_grid
from sd_lora_trainer_tpu.data.preprocess import preprocess
from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule
from sd_lora_trainer_tpu.inference import InferencePipeline, render_images
from sd_lora_trainer_tpu.models.lora import (
    TEXT_ENCODER_TARGETS,
    UNET_TARGETS,
    create_lora_params,
)
from sd_lora_trainer_tpu.models.tokenizer import (
    CLIPTokenizer,
    build_sized_test_vocab,
    load_tokenizer,
)
from sd_lora_trainer_tpu.models.weights import LoadedModels, load_models_from_checkpoint
from sd_lora_trainer_tpu.training.embeddings import TokenEmbeddingsHandler
from sd_lora_trainer_tpu.training.optimizers import build_optimizer
from sd_lora_trainer_tpu.training.step import (
    FrozenModels,
    StepConfig,
    TrainState,
    make_train_step,
)
from sd_lora_trainer_tpu.utils.utils import dtype_map, seed_everything


def build_tokenizers(loaded: LoadedModels):
    """Real CLIP vocab from model_paths["CLIP"] when staged; otherwise a
    sized synthetic vocab matching the encoders' embedding tables (offline /
    synthetic-checkpoint runs)."""
    vocab_dir = os.path.join(model_paths.get_path("CLIP") or ".", "tokenizer")
    test_words = ["photo", "style", "painting", "portrait", "object", "person", "the", "of", "a"]

    from sd_lora_trainer_tpu.models.tokenizer_native import (
        NativeCLIPTokenizer,
        native_available,
    )

    use_native = native_available()

    def build(vocab, merges, pad_token_id):
        # prefer the C++ tokenizer (csrc/clip_bpe.cpp) — tokenization runs
        # per step on the host (caption dropout), so it's the hot host path
        if use_native:
            return NativeCLIPTokenizer(vocab, merges, pad_token_id=pad_token_id)
        return CLIPTokenizer(vocab, merges, pad_token_id=pad_token_id)

    def make(cfg, pad_token_id=None):
        if cfg is None:
            return None
        if os.path.exists(os.path.join(vocab_dir, "vocab.json")):
            tok = load_tokenizer(vocab_dir, pad_token_id=pad_token_id)
            if len(tok.encoder) == cfg.vocab_size:
                return build(tok.encoder, [tuple(m) for m in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)], pad_token_id)
            from sd_lora_trainer_tpu.data.captioners import record_degradation

            record_degradation(
                "tokenizer", f"staged CLIP vocab ({len(tok.encoder)} tokens)",
                "synthetic sized vocab",
                f"size mismatch vs model vocab {cfg.vocab_size}",
            )
        else:
            from sd_lora_trainer_tpu.data.captioners import record_degradation

            record_degradation(
                "tokenizer", "staged CLIP vocab", "synthetic sized vocab",
                f"no vocab.json under {vocab_dir}; fine for synthetic checkpoints, "
                "wrong for real SD weights — stage the CLIP tokenizer files",
            )
        vocab, merges = build_sized_test_vocab(cfg.vocab_size, extra_words=test_words)
        return build(vocab, merges, pad_token_id)

    tok1 = make(loaded.text_encoder_config)
    tok2 = make(loaded.text_encoder_2_config, pad_token_id=0)
    return tok1, tok2


def download_weights_if_needed(pretrained_model: dict) -> str:
    path = pretrained_model["path"]
    if not os.path.exists(path) and pretrained_model.get("url"):
        from sd_lora_trainer_tpu.data.io import download

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        print(f"downloading {pretrained_model['url']} -> {path}")
        download(pretrained_model["url"], os.path.dirname(path) or ".", filepath=path)
    return path


def train(config: TrainingConfig):
    # multi-host: form the process cluster BEFORE first device use (no-op for
    # single-process runs — the reference's whole envelope). Every process
    # executes train(); host-side draws are deterministic from the seed so all
    # processes agree on the global batch, and each materializes only the
    # shards living on its own devices (parallel/distributed.py).
    from sd_lora_trainer_tpu.parallel.distributed import maybe_initialize_distributed

    world_size, process_rank = maybe_initialize_distributed()
    is_main_process = process_rank == 0
    if world_size > 1:
        if config.train_batch_size % world_size:
            raise ValueError(
                f"train_batch_size={config.train_batch_size} (global) must "
                f"divide across {world_size} processes"
            )
        print(
            f"[distributed] process {process_rank}/{world_size}, "
            f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
        )

    seed_everything(config.seed)
    weight_dtype = dtype_map[config.weight_type]

    if config.resume_from and not os.path.exists(config.resume_from):
        # fail fast — before minutes of preprocessing / latent caching
        raise FileNotFoundError(
            f"resume_from points at a missing train state: {config.resume_from}"
        )

    # ---- models (reference main.py:38-48) ----
    ckpt_path = download_weights_if_needed(config.pretrained_model)
    loaded = load_models_from_checkpoint(ckpt_path, dtype=weight_dtype)
    config.sd_model_version = loaded.version
    config.pretrained_model["version"] = loaded.version

    if not config.sample_imgs_lora_scale:
        config.sample_imgs_lora_scale = 0.75 if loaded.version == "sdxl" else 0.85
    if not config.validation_img_size:
        config.validation_img_size = 1024 if loaded.version == "sdxl" else 768

    # ---- preprocessing (one-shot host pipeline) ----
    # multiprocess: preprocessing is deterministic (same seed -> identical
    # outputs), but concurrent writes into ONE shared directory race
    # (truncated image files). Non-main ranks re-derive the same dataset in a
    # rank-suffixed scratch dir; rank 0 owns the canonical output tree.
    preprocess_dir = str(config.output_dir)
    if world_size > 1 and not is_main_process:
        preprocess_dir = os.path.join(str(config.output_dir), f"rank{process_rank}")
    config, input_dir = preprocess(
        config,
        working_directory=preprocess_dir,
        concept_mode=config.concept_mode,
        input_zip_path=config.lora_training_urls,
        caption_text=config.caption_prefix,
        mask_target_prompts=config.mask_target_prompts,
        target_size=config.resolution,
        crop_based_on_salience=config.crop_based_on_salience,
        use_face_detection_instead=config.use_face_detection_instead,
        left_right_flip_augmentation=config.left_right_flip_augmentation,
        augment_imgs_up_to_n=config.augment_imgs_up_to_n,
        caption_model=config.caption_model,
        seed=config.seed,
    )

    # ---- tokenizers + TI rows ----
    tok1, tok2 = build_tokenizers(loaded)
    handler = TokenEmbeddingsHandler(tokenizers=[tok1, tok2])
    tables = [
        loaded.text_encoder["text_model"]["embeddings"]["token_embedding"]["weight"],
        loaded.text_encoder_2["text_model"]["embeddings"]["token_embedding"]["weight"]
        if loaded.text_encoder_2
        else None,
    ]
    key = jax.random.PRNGKey(config.seed)
    ti_rows = handler.initialize_new_tokens(tables, config.inserting_list_tokens, key)

    # ---- optional TI warmup against the GPT concept description
    # (reference: embedding_handler.pre_optimize_token_embeddings) ----
    gpt_description = config.training_attributes.get("gpt_description")
    if config.token_warmup_steps > 0 and not config.disable_ti and gpt_description:
        from sd_lora_trainer_tpu.training.token_warmup import warmup_token_embeddings

        print(f"Warming up token embeddings with prompt: {gpt_description}...")
        te_params = {"te1": loaded.text_encoder}
        te_configs = {"te1": loaded.text_encoder_config}
        rows = {"te1": ti_rows[0]}
        token_ids = {"te1": jnp.asarray(tok1([config.token_dict["TOK"]]), jnp.int32)}
        target_ids = {"te1": jnp.asarray(tok1([gpt_description]), jnp.int32)}
        dist = {"te1": handler.distribution_targets[0]}
        if loaded.text_encoder_2 is not None:
            te_params["te2"] = loaded.text_encoder_2
            te_configs["te2"] = loaded.text_encoder_2_config
            rows["te2"] = ti_rows[1]
            token_ids["te2"] = jnp.asarray(tok2([config.token_dict["TOK"]]), jnp.int32)
            target_ids["te2"] = jnp.asarray(tok2([gpt_description]), jnp.int32)
            dist["te2"] = handler.distribution_targets[1]
        rows, warmup_losses = warmup_token_embeddings(
            rows, te_params, te_configs, loaded.version, token_ids, target_ids, dist,
            steps=config.token_warmup_steps, ti_lr=config.ti_lr,
            ti_weight_decay=config.ti_weight_decay, tok_cov_reg_w=config.tok_cov_reg_w,
        )
        ti_rows[0] = rows["te1"]
        if "te2" in rows:
            ti_rows[1] = rows["te2"]
        if config.debug and warmup_losses:
            from sd_lora_trainer_tpu.utils.plots import plot_loss

            plot_loss(warmup_losses, os.path.join(config.output_dir, "token_warmup_loss.png"))

    # ---- trainable tree + optimizer ----
    trainable: Dict = {}
    k_unet, k_te = jax.random.split(jax.random.fold_in(key, 1))
    if config.is_lora:
        trainable["unet"] = create_lora_params(
            k_unet,
            loaded.unet,
            rank=config.lora_rank,
            alpha_multiplier=config.lora_alpha_multiplier,
            targets=UNET_TARGETS,
            use_dora=config.use_dora,
        )
    else:
        print("Doing full fine-tuning on the U-Net")
        # copy: the train state is donated each step; aliasing loaded.unet
        # would delete the buffers rendering/frozen still reference
        trainable["unet"] = jax.tree.map(jnp.copy, loaded.unet)
    if not config.disable_ti:
        ti_group = {"te1": ti_rows[0]}
        if ti_rows[1] is not None:
            ti_group["te2"] = ti_rows[1]
        trainable["ti"] = ti_group
    if config.text_encoder_lora_optimizer is not None and config.is_lora:
        te_lora = {}
        te_lora["te1"] = create_lora_params(
            k_te, loaded.text_encoder, rank=config.text_encoder_lora_rank,
            alpha_multiplier=config.lora_alpha_multiplier,
            targets=TEXT_ENCODER_TARGETS, use_dora=config.use_dora,
        )
        if loaded.text_encoder_2 is not None:
            te_lora["te2"] = create_lora_params(
                jax.random.fold_in(k_te, 1), loaded.text_encoder_2,
                rank=config.text_encoder_lora_rank,
                alpha_multiplier=config.lora_alpha_multiplier,
                targets=TEXT_ENCODER_TARGETS, use_dora=config.use_dora,
            )
        trainable["te_lora"] = te_lora

    optimizer = build_optimizer(config, trainable)

    # ---- dataset: one-time VAE latent caching ----
    train_dataset = LatentDataset.from_directory(
        input_dir,
        loaded.vae,
        loaded.vae_config,
        size=tuple(config.train_img_size),
        substitute_caption_map=config.token_dict,
        aspect_ratio_bucketing=config.aspect_ratio_bucketing,
        train_batch_size=config.train_batch_size,
        seed=config.seed,
    )
    print(f"Final training captions:\n{train_dataset.captions[:40]}")

    n_batches_per_epoch = max(len(train_dataset) // config.train_batch_size, 1)
    config.num_train_epochs = int(
        math.ceil(config.max_train_steps * config.gradient_accumulation_steps / n_batches_per_epoch)
    )

    # ---- optional int8 frozen base (models/quant.py) ----
    # Replaces loaded.unet's kernels with int8 codes + scales BEFORE the
    # frozen bundle and the render pipeline capture it, so the bf16 originals
    # are freed and exactly one (quantized) base resides on device. Renders
    # merge adapters over the dequantized base (merge_lora handles QTensor).
    quantize_base = config.resolve_quantize_base()  # "auto" -> measured-best
    if quantize_base != config.quantize_base and config.quantize_base != "auto":
        # explicit int8/int8+te request that the resolver vetoed
        reason = "full finetune trains the base" if not config.is_lora else "tp shards bf16 kernels"
        print(f"[quantize_base] {reason}; ignoring")
    if quantize_base in ("int8", "int8+te"):
        from sd_lora_trainer_tpu.models.quant import (
            quantize_base_weights,
            quantized_bytes_saved,
        )

        # one jitted program (eager per-leaf quantization would issue
        # thousands of tiny device ops over a remote-TPU tunnel)
        loaded.unet = jax.jit(quantize_base_weights)(loaded.unet)
        saved = quantized_bytes_saved(loaded.unet)
        if quantize_base == "int8+te":
            # TE kernels too; the step then remats the conditioning so
            # the dequantized weights never persist fwd->bwd
            # (StepConfig.remat_te, training/step.py)
            loaded.text_encoder = jax.jit(quantize_base_weights)(loaded.text_encoder)
            saved += quantized_bytes_saved(loaded.text_encoder)
            if loaded.text_encoder_2 is not None:
                loaded.text_encoder_2 = jax.jit(quantize_base_weights)(
                    loaded.text_encoder_2
                )
                saved += quantized_bytes_saved(loaded.text_encoder_2)
        print(
            f"[quantize_base] frozen {'UNet+TE' if quantize_base == 'int8+te' else 'UNet'}"
            f" kernels -> int8 ({saved / 2**30:.2f} GiB freed)"
        )
    elif quantize_base != "none":
        raise ValueError(
            f"quantize_base must be 'auto', 'none', 'int8' or 'int8+te',"
            f" got {config.quantize_base!r}"
        )

    # ---- frozen bundle + jitted step ----
    dist_targets = {"te1": handler.distribution_targets[0]} if 0 in handler.distribution_targets else {}
    if 1 in handler.distribution_targets:
        dist_targets["te2"] = handler.distribution_targets[1]
    schedule = DDPMSchedule.create()
    frozen = FrozenModels(
        unet_params=loaded.unet,
        unet_config=loaded.unet_config,
        te1_params=loaded.text_encoder,
        te1_config=loaded.text_encoder_config,
        te2_params=loaded.text_encoder_2,
        te2_config=loaded.text_encoder_2_config,
        schedule=schedule,
        version=loaded.version,
        resolution=tuple(config.train_img_size),
        distribution_targets=dist_targets,
    )
    if (
        config.fuse_qkv
        and config.is_lora
        and not config.use_dora
        and config.sharding_mode != "tp"
    ):
        # fused qkv/kv projection layout for the jitted step's frozen copy
        # (models/fuse.py): fewer, larger MXU matmuls. Rendering/export read
        # loaded.unet, which stays unfused.
        from sd_lora_trainer_tpu.models.fuse import fuse_attention_projections

        frozen = dataclasses.replace(
            frozen, unet_params=fuse_attention_projections(frozen.unet_params)
        )

    img_ratio = config.train_img_size[0] / config.train_img_size[1]
    sc = StepConfig.from_config(config, img_ratio)
    if config.remat == "auto":
        # resolution of the measured-best plan lives in StepConfig.from_config
        print(f"[remat] auto -> {sc.remat}")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        import dataclasses as _dc

        sc = _dc.replace(sc, use_flash=False)
    # steps_per_call: K optimizer steps per jitted call (scan over a stacked
    # batch) — amortizes dispatch overhead; results are bit-identical to K=1
    # (per-step PRNG keys derive from the scanned step counter; equivalence
    # pinned by tests/test_steps_per_call.py). Falls back to 1 when shapes
    # can vary per call (bucketing) or per-step traces matter (debug).
    steps_per_call = max(int(config.steps_per_call), 1)
    if steps_per_call > 1 and config.debug:
        print("[steps_per_call] debug needs per-step granularity; using 1")
        steps_per_call = 1
    # Bucketed runs keep K>1: all K batches of one call are drawn from the
    # SAME bucket resolution (one compiled shape per call; see the grouped
    # drawing in assemble_batch/draw_bucketed below). Each bucket resolution
    # compiles its own K-scan program, covered by prewarm_compile.

    state = TrainState(
        step=jnp.zeros((), jnp.int32),  # strong-typed: weak_type flips cause silent recompiles
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        key=jax.random.fold_in(key, 2),
    )

    # ---- resume (capability the reference lacks: its checkpoints are
    # export-only, trainer/checkpoint.py never stores optimizer state) ----
    resume_step = 0
    if config.resume_from:
        from sd_lora_trainer_tpu.checkpoint import restore_train_state

        state = restore_train_state(config.resume_from, state)
        state = TrainState(
            step=jnp.asarray(state.step, jnp.int32),
            trainable=state.trainable,
            opt_state=state.opt_state,
            key=jnp.asarray(state.key, jnp.uint32),
        )
        resume_step = int(state.step)
        if resume_step >= config.max_train_steps:
            raise ValueError(
                f"resume_from state is at step {resume_step} >= "
                f"max_train_steps={config.max_train_steps}; nothing to train"
            )
        print(
            f"[resume] restored train state (trainable + optimizer moments + "
            f"PRNG) from {config.resume_from} at step {resume_step}"
        )

    # ---- multi-device sharding (DP for LoRA, FSDP for full finetune) ----
    # Single-chip runs skip this; on a pod slice the batch is sharded across
    # the "data" axis (must divide the global batch) and, in fsdp mode, the
    # trainable unet + optimizer state shard across the same axis.
    mesh = None
    # the mesh spans ALL devices in the cluster (local on one host; every
    # host's chips on a pod — collectives ride ICI/DCN as laid out by XLA)
    n_devices = config.mesh_data_parallel or len(jax.devices())
    sharding_mode = config.sharding_mode
    if sharding_mode == "tp":
        # 2-D data x model mesh: batch on 'data', the frozen UNet's
        # attention/ff projections Megatron-sharded on 'model'
        n_model = max(int(config.mesh_model_parallel), 1)
        n_data = n_devices // n_model
        tp_ok = (
            config.is_lora  # tp shards the FROZEN base; full finetune uses fsdp
            and n_model > 1
            and n_devices % n_model == 0
            and (n_data == 1 or config.train_batch_size % n_data == 0)
        )
        if not tp_ok:
            # a misconfigured tp run must not silently lose ALL parallelism:
            # fall through to the dp/fsdp mesh path instead of unsharded
            sharding_mode = "dp" if config.is_lora else "fsdp"
            print(
                f"[sharding] tp requested but devices={n_devices} / "
                f"model={n_model} / batch={config.train_batch_size} do not "
                f"divide (or run is not LoRA); falling back to {sharding_mode}"
            )
    if sharding_mode == "tp":
        from sd_lora_trainer_tpu.parallel.sharding import (
            create_mesh_2d,
            replicated,
            trainable_shardings,
            unet_tp_geglu_reshape,
            unet_tp_shardings,
        )

        mesh = create_mesh_2d(n_data, n_model)
        print(f"[sharding] tp over mesh {mesh}")
        # GEGLU projections re-laid-out to [in, 2, inner] so value/gate column
        # shards stay co-resident (no per-block resharding at a*gelu(b))
        tp_unet = unet_tp_geglu_reshape(frozen.unet_params)
        frozen = dataclasses.replace(
            frozen,
            unet_params=jax.tree.map(
                jax.device_put,
                tp_unet,
                unet_tp_shardings(tp_unet, mesh),
            ),
        )
        if sc.use_flash:
            # compose the Pallas flash kernel with the mesh: shard_map over
            # the head axis (ops/attention.py tp_shard) instead of disabling
            sc = dataclasses.replace(sc, flash_tp=(mesh, "data", "model"))
        # adapters/TI and their optimizer state replicate (MBs); the
        # frozen base is what shards under tp
        t_sh = trainable_shardings(trainable, mesh, mode="tp")
        rep = replicated(mesh)
        state = TrainState(
            step=jax.device_put(state.step, rep),
            trainable=jax.tree.map(jax.device_put, state.trainable, t_sh),
            opt_state=jax.tree.map(lambda x: jax.device_put(x, rep), state.opt_state),
            key=jax.device_put(state.key, rep),
        )
    elif n_devices > 1 and (config.train_batch_size % n_devices == 0):
        from sd_lora_trainer_tpu.parallel.sharding import (
            create_mesh,
            optimizer_state_shardings,
            replicated,
            trainable_shardings,
        )

        mesh = create_mesh(n_devices)
        print(f"[sharding] {sharding_mode} over mesh {mesh}")
        t_sh = trainable_shardings(trainable, mesh, mode=sharding_mode)
        rep = replicated(mesh)
        # optimizer moments inherit their param's sharding structurally (tree
        # position, not shape matching): fsdp-sharded unet moments shard, TI /
        # te-lora moments replicate with their params. device_put (not
        # re-init) so restored moments survive resume.
        opt_sh = optimizer_state_shardings(state.opt_state, trainable, t_sh, mesh)
        state = TrainState(
            step=jax.device_put(state.step, rep),
            trainable=jax.tree.map(jax.device_put, state.trainable, t_sh),
            opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_sh),
            key=jax.device_put(state.key, rep),
        )

    if world_size > 1 and mesh is None:
        raise ValueError(
            f"multi-process run needs a device mesh: batch="
            f"{config.train_batch_size} must divide {n_devices} global devices"
        )

    # built after the sharding block: StepConfig may carry the mesh (flash_tp)
    core_step = make_train_step(sc, optimizer)
    if steps_per_call > 1:
        def _multi_step(st, batches, fr):
            # fr is a tracer argument of the jitted fn — closing over it in
            # the scan body is fine (no constant capture)
            return jax.lax.scan(lambda s, b: core_step(s, b, fr), st, batches)

        step_fn = jax.jit(_multi_step, donate_argnums=(0,))
        # A horizon (or resume point) that isn't K-aligned leaves a ragged
        # tail of < K steps. It runs as single-step calls from THIS program
        # so the run stops EXACTLY at max_train_steps — the reference's
        # horizon semantics (and resume equivalence with K=1 runs) are worth
        # one extra tail compile on the rare ragged configs.
        step_fn_single = (
            jax.jit(core_step, donate_argnums=(0,))
            if (config.max_train_steps - resume_step) % steps_per_call
            else None
        )
    else:
        step_fn = jax.jit(core_step, donate_argnums=(0,))
        step_fn_single = None

    def put_batch(batch, leading: int = 1):
        if mesh is None:
            return batch
        if world_size > 1:
            from sd_lora_trainer_tpu.parallel.distributed import make_global_batch

            return make_global_batch(batch, mesh, leading=leading)
        from sd_lora_trainer_tpu.parallel.sharding import shard_batch_tree

        return shard_batch_tree(batch, mesh, leading=leading)

    checkpoint_dir = os.path.join(str(config.output_dir), "checkpoints")
    if is_main_process and os.path.exists(checkpoint_dir):
        shutil.rmtree(checkpoint_dir)
    os.makedirs(checkpoint_dir, exist_ok=True)

    losses: Dict[str, List] = {}  # device scalars, pulled to host lazily
    metrics_hosted: Dict[str, int] = {}  # per-key prefix already on host

    def losses_as_floats() -> Dict[str, List[float]]:
        return {k: [float(x) for x in v] for k, v in losses.items()}
    rng = np.random.RandomState(config.seed)
    # epoch-coverage sampling (reference DataLoader(shuffle=True), main.py:200,
    # :258): each image appears exactly once per epoch; replaces per-step iid
    # draws, which skew per-image exposure on the product's tiny 4-50 image
    # datasets. Deterministic from the seed, so resume fast-forward replays it.
    from sd_lora_trainer_tpu.data.dataset import EpochSampler

    sampler = EpochSampler(len(train_dataset), config.seed)
    start_time, images_done = time.time(), 0
    global_step, last_save_step = resume_step, 0
    accum = config.gradient_accumulation_steps
    token_string = config.token_dict["TOK"]

    # Buffered bucket draws: when a group (the `accum` micro-batches of one
    # step, or the K steps of one jitted call) is pinned to one resolution,
    # draws of OTHER resolutions are buffered and replayed for later groups
    # instead of discarded — the plan's marginal per-bucket frequency (and so
    # per-image epoch exposure) is preserved; only short-range ordering
    # changes (runs of same-resolution batches), which is the premise of
    # bucketing itself. Reference sampling semantics:
    # trainer/utils/aspect_ratio_bucketing.py:163-220 (one bucket per batch,
    # chosen ∝ bucket size — the group leader here follows exactly that law,
    # and followers inherit the leader's bucket).
    pending_draws: List = []

    def draw_bucketed(step_res):
        if step_res is None:
            # group LEADER: consume the oldest buffered draw (any
            # resolution) before asking the plan — this drains the buffer
            # every group, so buffered draws are delivered (never evicted)
            # and the plan's per-image epoch exposure is preserved
            if pending_draws:
                return pending_draws.pop(0)
        else:
            for i, (d, r) in enumerate(pending_draws):
                if r == step_res:
                    return pending_draws.pop(i)
        for _ in range(16):
            data, res = train_dataset.bucketed_batch()
            res = tuple(res)
            if step_res is None or res == step_res:
                return data, res
            pending_draws.append((data, res))
            if len(pending_draws) > 64:
                pending_draws.pop(0)
        # the plan ran dry of this resolution: resample the step bucket's pool
        store = train_dataset.bucket_latents[step_res]
        ids = list(store.keys())
        pick = rng.choice(ids, size=config.train_batch_size, replace=True)
        data = {
            "latent_mean": np.stack([store[i][0] for i in pick]),
            "latent_logvar": np.stack([store[i][1] for i in pick]),
            "mask": np.stack([store[i][2] for i in pick]),
            "captions": [train_dataset.captions[i] for i in pick],
        }
        return data, step_res

    def assemble_batch(step_res=None):
        """Host-side batch prep: sampling, caption dropout, tokenization,
        DAAM caption analysis; stacks [accum, B, ...]. Returns (batch, res).

        With bucketing, all micro-batches of one optimizer step share ONE
        resolution (stacked arrays must be uniform; one compiled shape per
        step); `step_res` additionally pins the whole draw to a resolution
        chosen by an earlier step of the same jitted K-scan call."""
        micro = []
        for _ in range(accum):
            if config.aspect_ratio_bucketing:
                data, res = draw_bucketed(step_res)
                if step_res is None:
                    step_res = tuple(res)
            else:
                data = train_dataset.batch(sampler.next_batch(config.train_batch_size))
            captions = list(data["captions"])
            if config.caption_dropout > 0.0:
                captions = [
                    token_string if rng.rand() < config.caption_dropout else c
                    for c in captions
                ]
            ids1 = np.asarray(tok1(captions), np.int32)
            ids2 = np.asarray(tok2(captions), np.int32) if tok2 else ids1
            lengths, positions = [], []
            for c in captions:
                n, pos = handler.ti_token_positions(c)
                lengths.append(n)
                positions.append(pos)
            full = {
                "latent_mean": data["latent_mean"],
                "latent_logvar": data["latent_logvar"],
                "mask": data["mask"],
                "input_ids": ids1,
                "input_ids_2": ids2,
                "caption_token_lengths": np.asarray(lengths, np.int32),
                "ti_token_positions": np.asarray(positions, np.int32),
            }
            # multiprocess: every process drew this identical GLOBAL batch
            # (deterministic host RNG); put_batch materializes only the rows
            # living on this host's devices (make_array_from_callback)
            micro.append(full)
        batch = {k: np.stack([m[k] for m in micro]) for k in micro[0]}
        batch["latent_scale"] = np.float32(train_dataset.vae_scaling_factor)
        return batch, step_res

    def current_adapters():
        # multiprocess: replicate any sharded leaves and pull to host numpy —
        # a COLLECTIVE (fsdp full-finetune shards the unet group), so every
        # rank must reach this call; only rank 0 then writes/renders.
        trainable_host = state.trainable
        if world_size > 1:
            from sd_lora_trainer_tpu.parallel.distributed import gather_to_host

            trainable_host = gather_to_host(state.trainable)
        unet_lora = trainable_host.get("unet") if config.is_lora else None
        te_loras = [None, None]
        if "te_lora" in trainable_host:
            te_loras[0] = trainable_host["te_lora"].get("te1")
            te_loras[1] = trainable_host["te_lora"].get("te2")
        ti = trainable_host.get("ti", {})
        rows = [np.asarray(ti["te1"]) if "te1" in ti else None,
                np.asarray(ti["te2"]) if "te2" in ti else None]
        return unet_lora, te_loras, rows, trainable_host

    def do_checkpoint(output_save_dir):
        # collectives first (multiprocess gathers sharded leaves/moments) —
        # every rank reaches them; everything filesystem-side is rank-0 only.
        # Non-main ranks must not even create the shared directory: the final
        # "already saved?" check is `os.path.exists(output_save_dir)`, and a
        # faster non-main rank pre-creating it would make rank 0 skip the save.
        unet_lora, te_loras, rows, trainable_host = current_adapters()
        if config.save_train_state:
            save_train_state(os.path.join(output_save_dir, "train_state"), state)
        if not is_main_process:
            return
        os.makedirs(output_save_dir, exist_ok=True)
        # refresh the degradation record: fallbacks after preprocess (e.g.
        # tokenizer synthetic vocab) must reach the saved config too
        from sd_lora_trainer_tpu.data.captioners import DEGRADATIONS

        config.training_attributes["degradations"] = list(DEGRADATIONS)
        config.save_as_json(os.path.join(output_save_dir, "training_args.json"))
        save_checkpoint(
            output_dir=output_save_dir,
            global_step=global_step,
            name=config.name,
            pretrained_model_version=config.pretrained_model["version"],
            token_dict=config.token_dict,
            is_lora=config.is_lora,
            ti_rows=rows,
            unet_lora=unet_lora,
            te_loras=te_loras,
            unet_params=None if config.is_lora else trainable_host["unet"],
            unet_config=None if config.is_lora else loaded.unet_config,
        )

    def do_render(output_save_dir):
        unet_lora, te_loras, rows, trainable_host = current_adapters()
        if not is_main_process:
            return []
        # full finetune renders with the CURRENT trained unet (the reference
        # renders through the live pipe whose unet is the finetuned one)
        render_unet = loaded.unet if config.is_lora else trainable_host["unet"]
        pipe = InferencePipeline(
            version=loaded.version,
            unet_params=render_unet,
            unet_config=loaded.unet_config,
            te1_params=loaded.text_encoder,
            te1_config=loaded.text_encoder_config,
            te2_params=loaded.text_encoder_2,
            te2_config=loaded.text_encoder_2_config,
            vae_params=loaded.vae,
            vae_config=loaded.vae_config,
            tokenizer_1=tok1,
            tokenizer_2=tok2,
            schedule=schedule,
            ti_rows=rows,
        )
        prompts = render_images(
            pipe,
            render_size=tuple(int(v) for v in (config.validation_img_size if isinstance(config.validation_img_size, (list, tuple)) else [config.validation_img_size] * 2)),
            lora_path=output_save_dir,
            train_step=global_step,
            seed=config.seed,
            lora_scale=config.sample_imgs_lora_scale,
            disable_ti=config.disable_ti,
            prompt_modifier=config.prompt_modifier,
            n_imgs=config.n_sample_imgs,
            unet_lora=unet_lora if config.is_lora else None,
            te_loras=te_loras,
        )
        grid_path = make_validation_img_grid(output_save_dir)
        shutil.copy(
            grid_path,
            os.path.join(os.path.dirname(output_save_dir), f"validation_grid_{global_step:04d}.jpg"),
        )
        return prompts

    if config.aspect_ratio_bucketing and config.prewarm_compile:
        # one throwaway step per bucket resolution: populates the jit cache
        # so mid-epoch shape switches don't stall on multi-minute compiles
        resolutions = sorted(train_dataset.bucket_latents.keys())
        print(f"[prewarm] compiling {len(resolutions)} bucket resolutions...")
        for res in resolutions:
            store = train_dataset.bucket_latents[res]
            ids = list(store.keys())[: config.train_batch_size]
            ids = (ids * config.train_batch_size)[: config.train_batch_size]
            dummy_caps = [train_dataset.captions[i] for i in ids]
            d_ids1 = np.asarray(tok1(dummy_caps), np.int32)
            d_ids2 = np.asarray(tok2(dummy_caps), np.int32) if tok2 else d_ids1
            lens, poss = zip(*(handler.ti_token_positions(c) for c in dummy_caps))
            dummy = {
                "latent_mean": np.stack([np.stack([store[i][0] for i in ids])] * accum),
                "latent_logvar": np.stack([np.stack([store[i][1] for i in ids])] * accum),
                "mask": np.stack([np.stack([store[i][2] for i in ids])] * accum),
                "input_ids": np.stack([d_ids1] * accum),
                "input_ids_2": np.stack([d_ids2] * accum),
                "caption_token_lengths": np.stack([np.asarray(lens, np.int32)] * accum),
                "ti_token_positions": np.stack([np.asarray(poss, np.int32)] * accum),
                "latent_scale": np.float32(train_dataset.vae_scaling_factor),
            }
            if step_fn_single is not None:
                # this run ends with single-step tail calls — prewarm that
                # program too so the tail doesn't stall mid-run
                throwaway = jax.tree.map(
                    lambda x: jnp.copy(x) if hasattr(x, "copy") else x, state
                )
                step_fn_single(throwaway, put_batch(dummy, leading=1), frozen)
            if steps_per_call > 1:
                # the K-scan program expects a [K, accum, ...] stacked batch
                dummy = {k: np.stack([v] * steps_per_call) for k, v in dummy.items()}
            throwaway = jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, "copy") else x, state)
            step_fn(throwaway, put_batch(dummy, leading=2 if steps_per_call > 1 else 1), frozen)

    validation_prompts: List[str] = []
    progress_stride = max(config.max_train_steps // 100, 1)
    lr_history: Dict[str, List[float]] = {}
    token_stds: Dict[str, List[float]] = {}

    def write_debug_plots():
        """Loss / LR / grad-norm / token-std PNGs (reference main.py:422-431)."""
        from sd_lora_trainer_tpu.utils.plots import (
            plot_grad_norms,
            plot_loss,
            plot_lrs,
            plot_param_histogram,
            plot_token_stds,
        )

        host_losses = losses_as_floats()
        plot_loss(
            {k: v for k, v in host_losses.items() if k != "grad_norm"},
            os.path.join(config.output_dir, "losses.png"),
        )
        plot_lrs(lr_history, os.path.join(config.output_dir, "learning_rates.png"))
        plot_grad_norms(
            {"total": host_losses.get("grad_norm", [])},
            os.path.join(config.output_dir, "grad_norms.png"),
        )
        targets = {
            f"te{i+1}_target": handler.std_token_embedding[i]
            for i in handler.std_token_embedding
        }
        plot_token_stds(
            token_stds, os.path.join(config.output_dir, "token_stds.png"), targets
        )
        if config.is_lora:
            leaves = [
                np.asarray(x).ravel()
                for x in jax.tree.leaves(state.trainable.get("unet", {}))
            ]
            if leaves:
                plot_param_histogram(
                    np.concatenate(leaves),
                    os.path.join(config.output_dir, f"lora_weights_{global_step}.png"),
                )

    if resume_step:
        # replay the host-side batch draws of the completed steps so the
        # data order / caption-dropout stream continues exactly where the
        # interrupted run left off (device PRNG continues via the restored
        # key: per-step keys are fold_in(state.key, step))
        print(f"[resume] fast-forwarding host data RNG through {resume_step} steps")
        # Replay the SAME grouped drawing pattern the loop uses so the host
        # RNG/bucket-plan stream lands exactly where the interrupted run was.
        # Consume EXACTLY resume_step draws: full K-groups while they fit,
        # singles for any remainder (a state saved by a K=1/debug run resumes
        # here with a different K — the grid anchors at resume_step below).
        if steps_per_call > 1 and resume_step % steps_per_call != 0:
            print(
                f"[resume] note: resume step {resume_step} is not a multiple "
                f"of steps_per_call={steps_per_call} (saved by a different-K "
                "run?) — data-stream replay is exact in draw count, grouped "
                "where possible"
            )
        ff = 0
        while ff < resume_step:
            if steps_per_call > 1 and ff + steps_per_call <= resume_step:
                _, r = assemble_batch()
                for _ in range(steps_per_call - 1):
                    assemble_batch(r)
                ff += steps_per_call
            else:
                assemble_batch()
                ff += 1

    # steps_per_call groups K steps per compiled call; the horizon stays
    # EXACT — a (max_train_steps - resume_step) that isn't a K multiple
    # leaves a ragged tail of < K steps that runs via step_fn_single.
    tail_steps = (
        (config.max_train_steps - resume_step) % steps_per_call
        if steps_per_call > 1
        else 0
    )
    if tail_steps:
        print(
            f"[steps_per_call] horizon {config.max_train_steps} = "
            f"{resume_step} + groups of {steps_per_call} + {tail_steps} "
            "single-step tail calls"
        )

    call_k = steps_per_call  # steps executed by the most recent call

    def crossed(stride: int) -> bool:
        """Did this call's steps cross a multiple of `stride`?"""
        prev = global_step - call_k
        return (global_step // stride) > (prev // stride)

    while global_step < config.max_train_steps:
        call_k = (
            steps_per_call
            if global_step + steps_per_call <= config.max_train_steps
            else 1
        )
        if call_k > 1:
            # grouped drawing: the first batch picks the resolution (under
            # bucketing), the remaining K-1 are pinned to it so the whole
            # call is one compiled shape
            first, call_res = assemble_batch()
            drawn = [first] + [
                assemble_batch(call_res)[0] for _ in range(steps_per_call - 1)
            ]
            batch = {k: np.stack([b[k] for b in drawn]) for k in drawn[0]}
            batch = put_batch(batch, leading=2)
            state, metrics = step_fn(state, batch, frozen)
        else:
            batch = put_batch(assemble_batch()[0])
            state, metrics = (step_fn_single or step_fn)(state, batch, frozen)
        global_step += call_k
        images_done += config.train_batch_size * accum * call_k

        for k, v in metrics.items():
            # keep the device scalars — float() here would force a device sync
            # every step and serialize host batch-prep against device compute;
            # values are pulled to host lazily at checkpoint/plot time.
            # (scan mode: v is a [K] device array; index lazily too)
            seq = losses.setdefault(k, [])
            if call_k > 1:
                seq.extend(v[i] for i in range(steps_per_call))
            else:
                seq.append(v)

        if crossed(64):
            # bulk-drain accumulated device scalars to host floats in one
            # transfer: bounds live device buffers on long runs without
            # putting a sync on the per-step critical path (the drained
            # values are from steps long since retired)
            for k, seq in losses.items():
                start = metrics_hosted.get(k, 0)
                if start < len(seq):
                    seq[start:] = [float(x) for x in jax.device_get(seq[start:])]
                    metrics_hosted[k] = len(seq)

        if config.debug:
            # LR + token-std tracking for the debug plots (reference
            # main.py:385-397 tracks these per step)
            from sd_lora_trainer_tpu.training.optimizers import current_lrs

            for k, v in current_lrs(config, jnp.asarray(global_step)).items():
                lr_history.setdefault(k, []).append(float(v))
            ti = state.trainable.get("ti", {})
            for which, rows_arr in ti.items():
                stds = np.asarray(rows_arr).std(axis=1)
                for i, s in enumerate(stds):
                    token_stds.setdefault(f"{which}_token_{i}", []).append(float(s))

        if crossed(config.checkpointing_steps) and global_step < (
            config.max_train_steps - 25
        ):
            fps = images_done / (time.time() - start_time)
            print(f"\n---- avg training fps: {fps:.2f}", flush=True)
            output_save_dir = f"{checkpoint_dir}/checkpoint-{global_step}"
            do_checkpoint(output_save_dir)
            if config.debug and is_main_process:
                write_debug_plots()
            validation_prompts = do_render(output_save_dir)
            last_save_step = global_step

        if config.save_train_state and crossed(config.checkpointing_steps):
            # rolling resume state at a fixed path, refreshed every
            # checkpoint interval WITHOUT the reference's near-end guard:
            # crash recovery needs a state that exists before the end
            save_train_state(os.path.join(str(config.output_dir), "train_state"), state)

        if crossed(progress_stride):
            yield min(global_step / config.max_train_steps + 0.05, 1.0)

    # ---- final save (reference main.py:466-547) ----
    # Gate on host-side step counters, which are identical python ints on
    # every rank — NOT on os.path.exists: only rank 0 creates checkpoint
    # dirs, so a filesystem check diverges across ranks (non-main ranks
    # would enter the do_checkpoint/do_render collectives rank 0 skips and
    # deadlock on pods without a shared FS; advisor r3).
    need_final = (global_step - last_save_step) > 26 or last_save_step == 0
    if need_final:
        output_save_dir = f"{checkpoint_dir}/checkpoint-{global_step}"
    else:
        output_save_dir = f"{checkpoint_dir}/checkpoint-{last_save_step}"

    if need_final:
        do_checkpoint(output_save_dir)
        if config.debug and is_main_process:
            write_debug_plots()
        validation_prompts = do_render(output_save_dir)
    else:
        print(f"Skipping final save, {output_save_dir} already exists")

    if config.debug and is_main_process:
        # Reproducibility breadcrumb (reference main.py:538-543): snapshot
        # the training source into the output dir in debug mode.
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_file_path = os.path.join(str(config.output_dir), "source_code.zip")
        with zipfile.ZipFile(zip_file_path, "w", zipfile.ZIP_DEFLATED) as zipf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zipf.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))

    config.job_time = time.time() - config.start_time
    config.training_attributes["validation_prompts"] = validation_prompts
    config.training_attributes["final_losses"] = {
        k: [float(x) for x in v[-5:]] for k, v in losses.items()
    }
    if config.debug:
        # full per-step series for convergence analysis
        # (scripts/convergence_run.py reads this from training_args.json)
        config.training_attributes["loss_series"] = losses_as_floats()
    if is_main_process:
        config.save_as_json(os.path.join(output_save_dir, "training_args.json"))
    print("Training job complete, saving outputs...", flush=True)

    return config, output_save_dir
