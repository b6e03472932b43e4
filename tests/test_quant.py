"""int8 frozen-base quantization (models/quant.py).

Covers: the per-output-channel quantizer's error bound; QTensor duck-typing
through dense/conv2d (+LoRA paths) and the fused qkv/kv concat; merge_lora
over a quantized base (the render path); end-to-end train-step closeness and
30-step loss-trajectory drift vs the bf16 base; and that the transform is
idempotent, skips the I/O boundary convs, and leaves non-kernel leaves alone.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.models.quant import (
    QTensor,
    quantize_base_weights,
    quantize_kernel,
    quantized_bytes_saved,
)


def test_quantize_kernel_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * jnp.exp(
        jax.random.normal(jax.random.PRNGKey(1), (1, 96))  # varied column scales
    )
    qt = quantize_kernel(w)
    assert qt.q.dtype == jnp.int8 and qt.s.shape == (1, 96)
    back = qt.astype(jnp.float32)
    colmax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert (np.abs(np.asarray(back - w)) <= colmax / 254 + 1e-7).all()
    # conv kernels reduce over all non-output axes
    wc = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 16))
    qc = quantize_kernel(wc)
    assert qc.s.shape == (1, 1, 1, 16) and qc.shape == wc.shape and qc.ndim == 4


def test_qtensor_is_a_pytree_and_survives_jit():
    qt = quantize_kernel(jnp.ones((4, 4)))
    leaves = jax.tree.leaves(qt)
    assert len(leaves) == 2
    out = jax.jit(lambda t: t)(qt)
    assert isinstance(out, QTensor)
    np.testing.assert_array_equal(np.asarray(out.q), np.asarray(qt.q))


def test_dense_and_conv_with_qtensor_close():
    from sd_lora_trainer_tpu.models.layers import conv2d, dense

    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (2, 7, 32))
    p = {
        "kernel": jax.random.normal(jax.random.fold_in(k, 1), (32, 48)),
        "bias": jax.random.normal(jax.random.fold_in(k, 2), (48,)),
        "lora": {
            "a": jax.random.normal(jax.random.fold_in(k, 3), (32, 4)) * 0.1,
            "b": jax.random.normal(jax.random.fold_in(k, 4), (4, 48)) * 0.1,
            "alpha": jnp.asarray(4.0),
        },
    }
    ref = dense(p, x)
    pq = dict(p, kernel=quantize_kernel(p["kernel"]))
    got = dense(pq, x)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, rtol=0, atol=1e-2
    )

    xc = jax.random.normal(k, (2, 8, 8, 16))
    pc = {
        "kernel": jax.random.normal(jax.random.fold_in(k, 5), (3, 3, 16, 24)),
        "bias": jnp.zeros((24,)),
    }
    refc = conv2d(pc, xc)
    gotc = conv2d(dict(pc, kernel=quantize_kernel(pc["kernel"])), xc)
    scale = np.abs(np.asarray(refc)).max()
    np.testing.assert_allclose(
        np.asarray(gotc) / scale, np.asarray(refc) / scale, rtol=0, atol=1e-2
    )


def test_quantize_base_weights_skips_and_idempotency():
    tree = {
        "conv_in": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.zeros((8,))},
        "conv_out": {"kernel": jnp.ones((3, 3, 8, 4))},
        "block": {"to_q": {"kernel": jnp.ones((8, 8))}},
        "norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }
    q1 = quantize_base_weights(tree)
    # boundary convs and non-kernel leaves untouched
    assert isinstance(q1["conv_in"]["kernel"], jnp.ndarray)
    assert isinstance(q1["conv_out"]["kernel"], jnp.ndarray)
    assert isinstance(q1["norm"]["scale"], jnp.ndarray)
    assert isinstance(q1["block"]["to_q"]["kernel"], QTensor)
    q2 = quantize_base_weights(q1)
    assert q2["block"]["to_q"]["kernel"] is q1["block"]["to_q"]["kernel"]
    assert quantized_bytes_saved(q1) == 8 * 8


def test_fused_concat_of_qtensors_matches_dequant_concat():
    from sd_lora_trainer_tpu.models.fuse import fuse_attention_projections
    from sd_lora_trainer_tpu.models.unet import TINY_SDXL_UNET_CONFIG, init_unet_params

    params = init_unet_params(jax.random.PRNGKey(0), TINY_SDXL_UNET_CONFIG, jnp.float32)
    qparams = quantize_base_weights(params)
    fused_q = fuse_attention_projections(qparams)

    def find_qkv(tree):
        if isinstance(tree, dict):
            if "qkv" in tree:
                return tree
            for v in tree.values():
                r = find_qkv(v)
                if r is not None:
                    return r
        if isinstance(tree, (list, tuple)):
            for v in tree:
                r = find_qkv(v)
                if r is not None:
                    return r
        return None

    a1q = find_qkv(fused_q)
    assert a1q is not None and isinstance(a1q["qkv"]["kernel"], QTensor)
    # the fused QTensor must dequantize to the concat of the per-projection
    # dequants (codes and per-output scales concatenate losslessly)
    a1 = find_qkv(fuse_attention_projections(params))
    ref = np.concatenate(
        [np.asarray(quantize_kernel(k).astype(jnp.float32)) for k in np.split(
            np.asarray(a1["qkv"]["kernel"]), 3, axis=1)],
        axis=1,
    )
    np.testing.assert_array_equal(np.asarray(a1q["qkv"]["kernel"].astype(jnp.float32)), ref)


def test_unet_forward_quantized_close():
    from tests.test_named_remat import _tiny_setup
    from sd_lora_trainer_tpu.models.unet import unet_forward

    cfg, params, lat, t, ctx, added = _tiny_setup()
    ref, _ = unet_forward(
        params, lat, t, ctx, cfg, added_cond=added, use_flash=False, remat=True
    )
    got, _ = unet_forward(
        quantize_base_weights(params), lat, t, ctx, cfg,
        added_cond=added, use_flash=False, remat=True,
    )
    # relative L2: the tiny config's 8-wide kernels make per-channel int8
    # noise much coarser than the real 320-1280-wide layers, so per-element
    # bounds are noisy — the aggregate error is the meaningful contract
    ref, got = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    rel_l2 = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel_l2 < 3e-2, rel_l2


def test_merge_lora_over_quantized_base():
    """Render path: merge_lora on a QTensor base yields dense kernels close
    to the bf16 merge; untargeted QTensor leaves pass through unchanged."""
    from sd_lora_trainer_tpu.models.lora import (
        UNET_TARGETS,
        create_lora_params,
        merge_lora,
    )
    from sd_lora_trainer_tpu.models.unet import TINY_SDXL_UNET_CONFIG, init_unet_params

    params = init_unet_params(jax.random.PRNGKey(0), TINY_SDXL_UNET_CONFIG, jnp.float32)
    lora = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    lora = jax.tree.map(lambda x: x + 0.01 if hasattr(x, "ndim") and x.ndim == 2 else x, lora)
    ref = merge_lora(params, lora, scale=0.8)
    got = merge_lora(quantize_base_weights(params), lora, scale=0.8)

    def kernels(tree, out):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "kernel":
                    out.append(v)
                else:
                    kernels(v, out)
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                kernels(v, out)
        return out

    ref_k, got_k = kernels(ref, []), kernels(got, [])
    assert len(ref_k) == len(got_k)
    n_merged = 0
    for r, g in zip(ref_k, got_k):
        if isinstance(g, QTensor):
            continue  # untargeted module: stays quantized (dense decodes it)
        n_merged += 1
        r, g = np.asarray(r), np.asarray(g)
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(g / scale, r / scale, rtol=0, atol=1e-2)
    assert n_merged > 0


def test_te_quant_step_with_remat_te():
    """quantize_base "int8+te": TEs quantized and the conditioning
    rematerialized (StepConfig.remat_te). The step's loss stays close to the
    bf16 run and gradients still flow into the TI rows through the
    checkpointed conditioning (rows actually move after the update)."""
    from sd_lora_trainer_tpu.training.optimizers import build_optimizer
    from sd_lora_trainer_tpu.training.step import StepConfig, TrainState, make_train_step
    from tests.test_train_step import _batch, _cfg, _trainable, make_tiny_frozen

    frozen = make_tiny_frozen()
    config = _cfg()
    sc = dataclasses.replace(
        StepConfig.from_config(config, 1.0), use_flash=False,
        remat="save:attn_out*", remat_te=True,
    )
    trainable = _trainable(frozen, config, jax.random.PRNGKey(1))
    frozen_q = dataclasses.replace(
        frozen,
        unet_params=quantize_base_weights(frozen.unet_params),
        te1_params=quantize_base_weights(frozen.te1_params),
        te2_params=quantize_base_weights(frozen.te2_params),
    )
    optimizer = build_optimizer(config, trainable)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        key=jax.random.PRNGKey(3),
    )
    batch = _batch()
    sc_ref = dataclasses.replace(sc, remat_te=False)
    _, m_ref = jax.jit(make_train_step(sc_ref, optimizer))(state, batch, frozen)
    new_state, m_q = jax.jit(make_train_step(sc, optimizer))(state, batch, frozen_q)
    ref, q = float(m_ref["img_loss"]), float(m_q["img_loss"])
    assert np.isfinite(q)
    # TE quantization perturbs the conditioning too; the tiny 32-wide TEs
    # make that noise far coarser than the real 768/1280-wide encoders
    assert abs(ref - q) / max(abs(ref), 1e-6) < 1e-1, (ref, q)
    # TI rows moved => grads flowed through the checkpointed conditioning
    for which in ("te1", "te2"):
        delta = np.abs(
            np.asarray(new_state.trainable["ti"][which])
            - np.asarray(trainable["ti"][which])
        ).max()
        assert delta > 0, which


import pytest


@pytest.mark.slow
def test_quantized_base_dp_mesh_step(eight_cpu_devices):
    """QTensor frozen leaves ride the 8-device DP mesh: codes+scales
    replicate like any frozen leaf, the sharded step compiles with real
    collective traffic, and the loss matches the single-device quantized
    step (same guarantee tests/test_parallel_equivalence.py pins for bf16)."""
    from sd_lora_trainer_tpu.parallel.sharding import (
        collective_stats,
        create_mesh,
        shard_batch_tree,
        trainable_shardings,
    )
    from sd_lora_trainer_tpu.training.optimizers import build_optimizer
    from sd_lora_trainer_tpu.training.step import StepConfig, TrainState, make_train_step
    from tests.test_train_step import _batch, _cfg, _trainable, make_tiny_frozen

    frozen = make_tiny_frozen()
    config = _cfg()
    sc = dataclasses.replace(
        StepConfig.from_config(config, 1.0), use_flash=False, remat="save:attn_out*"
    )
    trainable = _trainable(frozen, config, jax.random.PRNGKey(1))
    frozen_q = dataclasses.replace(
        frozen, unet_params=quantize_base_weights(frozen.unet_params)
    )
    optimizer = build_optimizer(config, trainable)
    step_fn = make_train_step(sc, optimizer)
    batch = _batch(batch=8)

    state1 = TrainState(
        step=jnp.zeros((), jnp.int32), trainable=trainable,
        opt_state=optimizer.init(trainable), key=jax.random.PRNGKey(3),
    )
    _, m1 = jax.jit(step_fn)(state1, jax.tree.map(jnp.asarray, batch), frozen_q)

    mesh = create_mesh(8)
    t_sh = trainable_shardings(trainable, mesh, mode="dp")
    state8 = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=jax.tree.map(jax.device_put, trainable, t_sh),
        opt_state=optimizer.init(trainable),
        key=jax.random.PRNGKey(3),
    )
    sharded_batch = shard_batch_tree(batch, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        compiled = jax.jit(step_fn).lower(state8, sharded_batch, frozen_q).compile()
        _, m8 = compiled(state8, sharded_batch, frozen_q)
    stats = collective_stats(compiled)
    assert stats.get("total_bytes", 0) > 10_000, stats
    np.testing.assert_allclose(
        float(m1["tot_loss"]), float(m8["tot_loss"]), rtol=1e-5, atol=1e-6
    )


def test_quantized_base_train_step_and_drift():
    """Full jitted train step over the quantized frozen base: loss close to
    the bf16-base run, and the 30-step overfitting trajectory tracks it
    (weight quantization is a small static perturbation the adapters train
    through, not a change in training dynamics)."""
    from sd_lora_trainer_tpu.training.optimizers import build_optimizer
    from sd_lora_trainer_tpu.training.step import StepConfig, TrainState, make_train_step
    from tests.test_train_step import _batch, _cfg, _trainable, make_tiny_frozen

    frozen = make_tiny_frozen()
    config = _cfg()
    sc = dataclasses.replace(
        StepConfig.from_config(config, 1.0), use_flash=False, remat="save:attn_out*"
    )
    # product order: adapters are created from the UNQUANTIZED tree
    trainable = _trainable(frozen, config, jax.random.PRNGKey(1))
    frozen_q = dataclasses.replace(
        frozen, unet_params=quantize_base_weights(frozen.unet_params)
    )
    optimizer = build_optimizer(config, trainable)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        key=jax.random.PRNGKey(3),
    )
    batch = _batch()
    fn = jax.jit(make_train_step(sc, optimizer))
    _, m_ref = fn(state, batch, frozen)
    _, m_q = fn(state, batch, frozen_q)
    ref, q = float(m_ref["img_loss"]), float(m_q["img_loss"])
    assert np.isfinite(q)
    assert abs(ref - q) / max(abs(ref), 1e-6) < 5e-2, (ref, q)
    assert np.isfinite(float(m_q["grad_norm"])) and float(m_q["grad_norm"]) > 0

    traj = {}
    for name, fz in (("ref", frozen), ("q8", frozen_q)):
        st = state
        ls = []
        for _ in range(30):
            st, m = fn(st, batch, fz)
            ls.append(float(m["img_loss"]))
        traj[name] = ls
    late_ref = np.mean(traj["ref"][-10:])
    late_q = np.mean(traj["q8"][-10:])
    assert abs(late_ref - late_q) / max(abs(late_ref), 1e-6) < 1e-1, (late_ref, late_q)
    assert late_q < np.mean(traj["q8"][:5]), traj["q8"]  # it actually learns
