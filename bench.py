"""Throughput benchmark: SDXL LoRA training imgs/sec/chip @1024px.

Runs the REAL jitted train step (training/step.py) — text-encoder forwards
(CLIP-L + CLIP-G with TI rows), full-size SDXL UNet forward/backward through
LoRA adapters with DAAM attention capture, all four loss terms, and the
three-group optimizer update — on randomly-initialized full-size weights
(throughput does not depend on weight values) with cached-latent batches,
exactly the shape of a real training iteration.

Baseline: the reference's published A100-class anchor is 6.0 imgs/s at bs=4
(predict.py:117-123, resolution unstated, config-default 512px; we bench at
1024px — 4x the pixels — and still compare against that number).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the SDXL train step takes minutes to compile;
# cache hits make driver re-runs and multi-resolution benches cheap.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# BENCH_PLATFORM=cpu forces the CPU backend for smoke tests. The env var
# JAX_PLATFORMS alone is NOT enough here: the session sitecustomize re-pins
# axon at interpreter start, so the config must be updated before backend init.
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])


def _init_devices_or_die(timeout_s: int) -> None:
    """Backend-init watchdog: jax.devices() on the axon tunnel BLOCKS
    indefinitely when the tunnel is down (no client-side timeout), which
    would leave the driver with a silent hang instead of a bench record.
    Init in a daemon thread; on expiry print a diagnostic JSON line (so the
    round artifact says WHY there is no number) and hard-exit."""
    import threading

    done = threading.Event()
    info = {}

    def init():
        info["devices"] = jax.devices()
        done.set()

    threading.Thread(target=init, daemon=True).start()
    if not done.wait(timeout_s):
        print(
            json.dumps(
                {
                    "metric": "train_throughput",
                    "value": None,
                    "unit": "imgs/sec/chip",
                    "vs_baseline": None,
                    "error": f"TPU backend init hung >{timeout_s}s (axon tunnel down)",
                }
            ),
            flush=True,
        )
        sys.stderr.write("[bench] FATAL: backend init timed out\n")
        os._exit(3)
    sys.stderr.write(f"[bench] devices: {info['devices']}\n")


def main():
    _init_devices_or_die(int(os.environ.get("BENCH_DEVICE_TIMEOUT", "600")))
    model = os.environ.get("BENCH_MODEL", "sdxl")  # sdxl | sd15
    # bs=8 is the measured best for both models on one v5e chip
    # (BENCH_NOTES.md): sdxl@1024 3.79 imgs/s (bs16 OOMs), sd15@512 21.9
    # imgs/s (bs16 is flat at 21.5).
    batch_size = int(os.environ.get("BENCH_BS", "8"))
    default_res = "1024" if model == "sdxl" else "512"
    resolution = int(os.environ.get("BENCH_RES", default_res))
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    latent = resolution // 8

    from sd_lora_trainer_tpu.config import TrainingConfig
    from sd_lora_trainer_tpu.diffusion.losses import DistributionLossTargets
    from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule
    from sd_lora_trainer_tpu.models.clip import (
        CLIP_BIG_G_CONFIG,
        CLIP_L_CONFIG,
        init_clip_params,
    )
    from sd_lora_trainer_tpu.models.lora import UNET_TARGETS, create_lora_params
    from sd_lora_trainer_tpu.models.unet import (
        SD15_UNET_CONFIG,
        SDXL_UNET_CONFIG,
        init_unet_params,
    )
    from sd_lora_trainer_tpu.training.optimizers import build_optimizer
    from sd_lora_trainer_tpu.training.step import (
        FrozenModels,
        StepConfig,
        TrainState,
        make_train_step,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    print(f"[bench] devices: {jax.devices()}", flush=True, file=sys.stderr)
    print(f"[bench] initializing full-size {model} stack (bs={batch_size}, {resolution}px)...", flush=True, file=sys.stderr)
    _t_init = time.time()

    # BENCH_TINY=1 swaps in the tiny model configs so the COMPLETE bench code
    # path (init, levers, scan, JSON emission) runs in seconds on CPU — used
    # by tests/test_bench_schema.py; never for reported numbers.
    tiny = os.environ.get("BENCH_TINY") == "1"
    if tiny:
        from sd_lora_trainer_tpu.models.synthesize import (
            TINY_CLIP_G_CONFIG,
            TINY_CLIP_L_CONFIG,
        )
        from sd_lora_trainer_tpu.models.unet import (
            TINY_SD15_UNET_CONFIG,
            TINY_SDXL_UNET_CONFIG,
        )

        unet_cfg = TINY_SDXL_UNET_CONFIG if model == "sdxl" else TINY_SD15_UNET_CONFIG
        te1_cfg = TINY_CLIP_L_CONFIG
        te2_cfg = TINY_CLIP_G_CONFIG
    else:
        unet_cfg = SDXL_UNET_CONFIG if model == "sdxl" else SD15_UNET_CONFIG
        te1_cfg = CLIP_L_CONFIG
        te2_cfg = CLIP_BIG_G_CONFIG
    # Jit the inits: eager per-leaf init would issue thousands of tiny device
    # ops (catastrophic over a remote TPU tunnel); one compiled program each.
    unet = jax.jit(lambda k: init_unet_params(k, unet_cfg, dtype=jnp.bfloat16))(ks[0])
    te1 = jax.jit(lambda k: init_clip_params(k, te1_cfg, dtype=jnp.bfloat16))(ks[1])
    te2 = None
    if model == "sdxl":
        te2 = jax.jit(lambda k: init_clip_params(k, te2_cfg, dtype=jnp.bfloat16))(ks[2])
    jax.block_until_ready(unet)
    print(f"[bench] init done in {time.time() - _t_init:.1f}s", flush=True, file=sys.stderr)
    t1 = te1["text_model"]["embeddings"]["token_embedding"]["weight"]
    dist_targets = {"te1": DistributionLossTargets.from_embeddings(t1)}
    if te2 is not None:
        t2 = te2["text_model"]["embeddings"]["token_embedding"]["weight"]
        dist_targets["te2"] = DistributionLossTargets.from_embeddings(t2)

    # Adapters are created from the UNFUSED tree (the product order,
    # main.py): fusion deletes the q/k/v base kernels, so creating adapters
    # after it silently dropped 50 of SDXL's 91 LoRA targets — caught in
    # round 4; earlier fused-mode numbers carried that small flattering bias.
    def make_trainable(k3, k4, k5):
        t = {
            "unet": create_lora_params(k3, unet, rank=16, targets=UNET_TARGETS),
            "ti": {"te1": jax.random.normal(k4, (3, te1_cfg.hidden_size)) * 0.01},
        }
        if model == "sdxl":
            t["ti"]["te2"] = jax.random.normal(k5, (3, te2_cfg.hidden_size)) * 0.01
        return t

    trainable = jax.jit(make_trainable)(ks[3], ks[4], ks[5])
    # self-describing artifact (VERDICT r4 weak #5): count the adapter sites
    # actually trained so cross-round numbers can't silently mix adapter sets
    # (the r4 bench bug trained 41 of 91 SDXL targets).
    adapter_targets = sum(
        1
        for path, _ in jax.tree_util.tree_flatten_with_path(trainable["unet"])[0]
        if getattr(path[-1], "key", None) == "a"  # one lora {a,b,alpha} per site
    )

    baseq = os.environ.get("BENCH_BASEQ", "")
    if baseq in ("int8", "int8+te"):
        # int8 frozen base (models/quant.py): frees ~2.4 GB of HBM for
        # richer save: plans; dequant runs inside the remat'd blocks.
        # "int8+te" also quantizes the TEs (+~0.75 GB) — StepConfig.remat_te
        # then remats the conditioning so the dequants stay transient.
        from sd_lora_trainer_tpu.models.quant import quantize_base_weights

        # one jitted program: eager per-leaf quantization would issue
        # thousands of tiny device ops over the tunnel
        unet = jax.jit(quantize_base_weights)(unet)
        if baseq == "int8+te":
            te1 = jax.jit(quantize_base_weights)(te1)
            if te2 is not None:
                te2 = jax.jit(quantize_base_weights)(te2)
        print(f"[bench] frozen base kernels -> {baseq}", flush=True, file=sys.stderr)
    elif baseq:
        raise SystemExit(f"unknown BENCH_BASEQ={baseq!r}")

    if os.environ.get("BENCH_FUSE_QKV", "1") == "1":
        # fused qkv/kv projection layout (models/fuse.py): fewer, larger MXU
        # matmuls; numerics pinned by tests/test_fused_qkv.py
        from sd_lora_trainer_tpu.models.fuse import fuse_attention_projections

        unet = fuse_attention_projections(unet)
        print("[bench] fused qkv/kv projections", flush=True, file=sys.stderr)

    frozen = FrozenModels(
        unet_params=unet,
        unet_config=unet_cfg,
        te1_params=te1,
        te1_config=te1_cfg,
        te2_params=te2,
        te2_config=te2_cfg if model == "sdxl" else None,
        schedule=DDPMSchedule.create(),
        version=model,
        resolution=(resolution, resolution),
        distribution_targets=dist_targets,
    )

    config = TrainingConfig(
        lora_training_urls="bench",
        concept_mode="style",
        sd_model_version=model,
        max_train_steps=400,
        lora_rank=16,
        train_batch_size=batch_size,
        resolution=resolution,
        quantize_base=baseq or "none",  # -> StepConfig.remat_te for int8+te
        _testing_no_output_dir=True,
    )

    optimizer = build_optimizer(config, trainable)
    sc = StepConfig.from_config(config, 1.0)
    import dataclasses

    if os.environ.get("BENCH_FLASH", "1") == "0":
        sc = dataclasses.replace(sc, use_flash=False)
        print("[bench] flash attention DISABLED (einsum path)", flush=True, file=sys.stderr)
    remat_mode = os.environ.get("BENCH_REMAT", "auto")
    if remat_mode == "auto":
        # resolved by StepConfig.from_config (the product's "auto" plan:
        # sd15@<=512px -> off, else save:flash_out*,flash_lse*)
        print(f"[bench] remat auto -> {sc.remat}", flush=True, file=sys.stderr)
    elif remat_mode == "dots":
        sc = dataclasses.replace(sc, remat="dots")
        print("[bench] remat policy: dots_with_no_batch_dims_saveable", flush=True, file=sys.stderr)
    elif remat_mode == "light":
        sc = dataclasses.replace(sc, remat="light")
        print("[bench] remat: light (attention blocks only)", flush=True, file=sys.stderr)
    elif remat_mode == "off":
        sc = dataclasses.replace(sc, remat=False)
        print("[bench] remat DISABLED", flush=True, file=sys.stderr)
    elif remat_mode == "full":
        sc = dataclasses.replace(sc, remat=True)
        print("[bench] remat: full block remat", flush=True, file=sys.stderr)
    elif remat_mode.startswith(("save:", "offload:", "light+save:")):
        # named-activation remat (models/unet.py): e.g.
        # BENCH_REMAT='save:flash_out*,flash_lse*' keeps the flash kernel's
        # softmax residuals on device, eliding its fwd recompute in backward
        sc = dataclasses.replace(sc, remat=remat_mode)
        print(f"[bench] remat policy: {remat_mode}", flush=True, file=sys.stderr)
    else:
        # a silently-misparsed policy would invalidate the measurement
        raise SystemExit(f"unknown BENCH_REMAT={remat_mode!r}")
    stash8 = os.environ.get("BENCH_STASH8", "")
    if stash8:
        # e.g. BENCH_STASH8='flash_out*,attn_out_c1280' — those names' remat
        # stash is row-wise int8 (ops/stash8.py); the save: plan must list them
        sc = dataclasses.replace(sc, stash8=stash8)
        print(f"[bench] stash8: {stash8}", flush=True, file=sys.stderr)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),  # strong-typed: weak_type flips cause silent recompiles
        trainable=trainable,
        opt_state=jax.jit(optimizer.init)(trainable),
        key=jax.random.PRNGKey(1),
    )
    # BENCH_SCAN=K runs K train steps per jitted call via lax.scan over a
    # stacked batch — mirroring the product train loop's steps_per_call
    # (config default 4; equivalence pinned by tests/test_steps_per_call.py).
    # Measured +8% at bs=8 @1024px over single-step dispatch.
    scan_k = int(os.environ.get("BENCH_SCAN", "4"))
    core_step = make_train_step(sc, optimizer)
    if scan_k > 1:
        def multi_step(state, batches, frozen):
            # frozen is a tracer argument of this jitted fn, so closing over
            # it in the scan body is fine (no constant capture).
            return jax.lax.scan(lambda st, b: core_step(st, b, frozen), state, batches)

        step_fn = jax.jit(multi_step, donate_argnums=(0,))
        print(f"[bench] scan mode: {scan_k} steps per call", flush=True, file=sys.stderr)
    else:
        step_fn = jax.jit(core_step, donate_argnums=(0,))

    # Complete lever set, emitted inside every JSON result line so BENCH_r*.json
    # artifacts are comparable across rounds without log archaeology
    # (schema pinned by tests/test_bench_schema.py).
    lever_config = {
        "model": model,
        "resolution": resolution,
        "batch_size": batch_size,
        "remat": sc.remat,
        "stash8": sc.stash8 or "",
        "baseq": baseq or "none",
        "fuse_qkv": os.environ.get("BENCH_FUSE_QKV", "1") == "1",
        "flash": sc.use_flash,
        "scan_k": scan_k,
        "buckets": os.environ.get("BENCH_BUCKETS", ""),
        "adapter_targets": adapter_targets,
        "lora_rank": 16,
    }

    rng = np.random.RandomState(0)

    def make_batch(lat_h, lat_w):
        # token ids derived from the TE vocab so BENCH_TINY stays in range:
        # bos/eos, 9 random content tokens, TI rows appended after the vocab
        vocab, eos = te1_cfg.vocab_size, te1_cfg.eos_token_id
        ids = np.full((1, batch_size, 77), eos, np.int32)
        ids[..., 0] = eos - 1
        ids[..., 1:10] = rng.randint(4, vocab - 8, size=(1, batch_size, 9))
        ids[..., 3:6] = [vocab, vocab + 1, vocab + 2]
        b = {
            "latent_mean": jnp.asarray(
                rng.randn(1, batch_size, lat_h, lat_w, 4), jnp.bfloat16
            ),
            "latent_logvar": jnp.full((1, batch_size, lat_h, lat_w, 4), -6.0, jnp.bfloat16),
            "mask": jnp.ones((1, batch_size, lat_h, lat_w, 1), jnp.bfloat16),
            "input_ids": jnp.asarray(ids),
            "input_ids_2": jnp.asarray(ids),
            "caption_token_lengths": jnp.full((1, batch_size), 12, jnp.int32),
            "ti_token_positions": jnp.tile(jnp.asarray([[3, 4, 5]]), (1, batch_size, 1)),
            "latent_scale": jnp.float32(0.13025),
        }
        if scan_k > 1:
            b = jax.tree.map(lambda x: jnp.stack([x] * scan_k), b)
        return b

    # BENCH_BUCKETS='1024x1024,832x1216': aspect-ratio-bucketed throughput —
    # one compiled K-scan program per bucket shape, calls alternating
    # round-robin, exactly the product's grouped bucketed loop
    # (main.py:draw_bucketed). The datapoint that certifies the scan win
    # survives multi-resolution configs. Skips MFU (per-shape FLOPs differ).
    buckets_env = os.environ.get("BENCH_BUCKETS", "")
    if buckets_env:
        sizes = [tuple(int(v) for v in s.split("x")) for s in buckets_env.split(",")]
        step_fns, batches = [], []
        for (h, w) in sizes:
            # daam_img_ratio is width/height (losses.py:_infer_hw); buckets
            # are 'HxW'. h/w passed the h*w==q_len assert too (transposed
            # dims), but oriented the DAAM resize sideways.
            sc_b = dataclasses.replace(sc, daam_img_ratio=w / h)
            core_b = make_train_step(sc_b, optimizer)
            if scan_k > 1:
                def multi_b(state, bt, frozen, _core=core_b):
                    return jax.lax.scan(lambda st, b: _core(st, b, frozen), state, bt)

                step_fns.append(jax.jit(multi_b, donate_argnums=(0,)))
            else:
                step_fns.append(jax.jit(core_b, donate_argnums=(0,)))
            batches.append(make_batch(h // 8, w // 8))
        print(f"[bench] bucketed: {sizes}, K={scan_k}", flush=True, file=sys.stderr)
        for f, b, s in zip(step_fns, batches, sizes):  # compile + warmup each
            t0 = time.time()
            state, metrics = f(state, b, frozen)
            jax.block_until_ready(metrics["tot_loss"])
            print(f"[bench] bucket {s} compile+step {time.time()-t0:.1f}s",
                  flush=True, file=sys.stderr)
        n_calls = max(n_steps // scan_k, 2)
        t0 = time.time()
        for i in range(n_calls):
            state, metrics = step_fns[i % len(sizes)](state, batches[i % len(sizes)], frozen)
        loss = float(jnp.ravel(metrics["tot_loss"])[-1])  # host fetch = sync
        dt = time.time() - t0
        total = n_calls * scan_k
        imgs_per_sec = batch_size * total / dt
        mean_px = sum(h * w for h, w in sizes) / len(sizes)
        anchor = 6.0 * (512.0**2 / mean_px)
        print(f"[bench] {total} bucketed steps in {dt:.2f}s (loss={loss:.4f})",
              flush=True, file=sys.stderr)
        print(json.dumps({
            "metric": "train_throughput_bucketed",
            "value": round(imgs_per_sec, 3),
            "unit": "imgs/sec/chip",
            "vs_baseline": round(imgs_per_sec / anchor, 3),
            "config": lever_config,
        }), flush=True)
        return

    batch = make_batch(latent, latent)

    # Program FLOPs for MFU: lower+compile AOT (shares the persistent cache
    # with the jit call below) and read XLA's cost analysis. Runs BEFORE the
    # first real call so the donated state buffers are still live.
    step_flops = None
    try:
        _ca = step_fn.lower(state, batch, frozen).compile().cost_analysis()
        if isinstance(_ca, (list, tuple)):
            _ca = _ca[0]
        step_flops = float(_ca.get("flops", 0.0)) or None
    except Exception as e:  # cost analysis is best-effort (platform-dependent)
        print(f"[bench] cost_analysis unavailable: {e}", flush=True, file=sys.stderr)

    # Whether cost_analysis counts a lax.scan (while-loop) body once or
    # trip-count times is XLA-version-dependent. Probe empirically with a tiny
    # scanned matmul of known FLOPs so the scanned train step's number is
    # normalized correctly; if the convention is unrecognizable, report
    # mfu_approx instead of mfu.
    mfu_exact = True
    if step_flops and scan_k > 1:
        try:
            _probe_k, _n = 4, 128
            _pa = jnp.zeros((_n, _n), jnp.float32)
            _pf = jax.jit(
                lambda c: jax.lax.scan(lambda s, _: (s @ _pa, None), c, None, length=_probe_k)[0]
            )
            _pca = _pf.lower(_pa).compile().cost_analysis()
            if isinstance(_pca, (list, tuple)):
                _pca = _pca[0]
            _ratio = float(_pca.get("flops", 0.0)) / (2 * _n**3)
            if abs(_ratio - _probe_k) < 1.0:
                # bodies counted per trip: program FLOPs cover all K steps
                step_flops /= scan_k
                print(f"[bench] scan FLOPs counted per-trip (ratio {_ratio:.2f}); "
                      f"normalizing by K={scan_k}", flush=True, file=sys.stderr)
            elif abs(_ratio - 1.0) < 0.3:
                pass  # body counted once: step_flops already per-step
            else:
                mfu_exact = False
                print(f"[bench] unrecognized scan FLOPs convention "
                      f"(probe ratio {_ratio:.2f}); reporting mfu_approx",
                      flush=True, file=sys.stderr)
        except Exception as e:
            mfu_exact = False
            print(f"[bench] scan-convention probe failed: {e}", flush=True, file=sys.stderr)

    print("[bench] compiling + warmup...", flush=True, file=sys.stderr)
    t0 = time.time()
    state, metrics = step_fn(state, batch, frozen)
    jax.block_until_ready(metrics["tot_loss"])
    print(f"[bench] first step (compile) took {time.time() - t0:.1f}s", flush=True, file=sys.stderr)
    # one more warmup step post-compile (also catches silent recompiles).
    # Synchronize by FETCHING the loss value — block_until_ready alone has
    # proven unreliable on the experimental axon platform.
    def last_loss(m):
        return float(jnp.ravel(m["tot_loss"])[-1])

    t0 = time.time()
    state, metrics = step_fn(state, batch, frozen)
    loss_val = last_loss(metrics)
    print(f"[bench] second step took {time.time() - t0:.2f}s (loss={loss_val:.4f})", flush=True, file=sys.stderr)

    # BENCH_LOG_LOSSES=1 prints every call's full loss vector — used by the
    # full-size quantization-drift A/B (scripts/r5_queue.sh trajectory runs);
    # off for throughput numbers since the host fetch syncs every call.
    log_losses = os.environ.get("BENCH_LOG_LOSSES") == "1"
    n_calls = max(n_steps // scan_k, 1)
    t0 = time.time()
    for i in range(n_calls):
        state, metrics = step_fn(state, batch, frozen)
        if log_losses:
            vals = ",".join(f"{v:.6f}" for v in np.ravel(metrics["tot_loss"]))
            print(f"[bench] losses call {i}: {vals}", flush=True, file=sys.stderr)
        elif i < 3:
            print(f"[bench] call {i}: loss={last_loss(metrics):.4f} "
                  f"({time.time() - t0:.2f}s cumulative)", flush=True, file=sys.stderr)
    final_loss = last_loss(metrics)  # host fetch = hard sync
    dt = time.time() - t0
    n_steps = n_calls * scan_k
    print(f"[bench] final loss: {final_loss:.4f}", flush=True, file=sys.stderr)

    imgs_per_sec = batch_size * n_steps / dt

    # MFU = measured FLOP/s over the device's peak bf16 matmul rate.
    mfu = None
    if step_flops:
        kind = jax.devices()[0].device_kind.lower()
        peak_map = [
            ("v5 lite", 197e12),  # v5e
            ("v5litepod", 197e12),
            ("v6 lite", 918e12),  # v6e / Trillium
            ("v6e", 918e12),
            ("v5p", 459e12),
            ("v5", 459e12),
            ("v4", 275e12),
        ]
        peak = next((p for pat, p in peak_map if pat in kind), None)
        if peak:
            # step_flops was normalized to per-step above (scan-convention
            # probe); if the convention was unrecognizable, mfu_exact is False
            # and the field is emitted as mfu_approx.
            mfu = step_flops / (dt / n_steps) / peak
            print(
                f"[bench] step FLOPs {step_flops/1e12:.2f} TF, "
                f"{step_flops / (dt / n_steps) / 1e12:.1f} TF/s achieved, "
                f"MFU {mfu*100:.1f}% of {peak/1e12:.0f} TF/s peak ({kind})",
                flush=True,
                file=sys.stderr,
            )
    # A100-class anchor: 6.0 imgs/s at bs=4 (reference predict.py:121),
    # measured at the reference's 512px default resolution. vs_baseline is
    # pixel-normalized so benches at other resolutions compare fairly:
    # anchor_at_res = 6.0 * (512/res)^2.
    anchor_512 = 6.0
    anchor_at_res = anchor_512 * (512.0 / resolution) ** 2
    print(f"[bench] {n_steps} steps in {dt:.2f}s -> {imgs_per_sec:.2f} imgs/s", flush=True, file=sys.stderr)
    print(
        f"[bench] A100 anchor at {resolution}px (pixel-normalized from "
        f"6.0 imgs/s @512px): {anchor_at_res:.2f} imgs/s",
        flush=True,
        file=sys.stderr,
    )
    out = {
        "metric": f"{model}_lora_train_imgs_per_sec_chip_{resolution}px_bs{batch_size}",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / anchor_at_res, 3),
        "config": lever_config,
    }
    if mfu is not None:
        out["mfu" if mfu_exact else "mfu_approx"] = round(mfu, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
