"""LoRA/DoRA tests: injection math (golden vs peft), merge equivalence, and
kohya export/import round-trip + key-naming contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_lora_trainer_tpu.models.layers import dense
from sd_lora_trainer_tpu.models.lora import (
    TEXT_ENCODER_TARGETS,
    UNET_TARGETS,
    create_lora_params,
    inject_lora,
    kohya_state_dict,
    load_kohya_state_dict,
    merge_lora,
)
from sd_lora_trainer_tpu.models.unet import TINY_SD15_UNET_CONFIG, init_unet_params, unet_forward


def _tiny_unet():
    cfg = TINY_SD15_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_lora_init_structure_and_zero_at_start():
    cfg, params = _tiny_unet()
    lora = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    # b starts at zero -> injected forward == base forward
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.cross_attention_dim))
    t = jnp.array([3])
    base_out, _ = unet_forward(params, lat, t, ctx, cfg, use_flash=False, remat=False)
    injected = inject_lora(params, lora)
    lora_out, _ = unet_forward(injected, lat, t, ctx, cfg, use_flash=False, remat=False)
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(lora_out), atol=1e-6)


def test_lora_changes_output_when_b_nonzero():
    cfg, params = _tiny_unet()
    lora = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    lora = jax.tree.map(lambda x: x + 0.05 if getattr(x, 'ndim', 0) >= 2 else x, lora)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.cross_attention_dim))
    base_out, _ = unet_forward(params, lat, jnp.array([3]), ctx, cfg, use_flash=False, remat=False)
    out, _ = unet_forward(
        inject_lora(params, lora), lat, jnp.array([3]), ctx, cfg, use_flash=False, remat=False
    )
    assert not np.allclose(np.asarray(base_out), np.asarray(out), atol=1e-5)


def test_merge_equals_inject():
    cfg, params = _tiny_unet()
    lora = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    lora = jax.tree.map(lambda x: x + 0.03 if getattr(x, 'ndim', 0) >= 2 else x, lora)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.cross_attention_dim))
    out_inject, _ = unet_forward(
        inject_lora(params, lora), lat, jnp.array([3]), ctx, cfg, use_flash=False, remat=False
    )
    out_merge, _ = unet_forward(
        merge_lora(params, lora), lat, jnp.array([3]), ctx, cfg, use_flash=False, remat=False
    )
    np.testing.assert_allclose(np.asarray(out_inject), np.asarray(out_merge), atol=2e-5)


def test_lora_scale_halves_delta():
    cfg, params = _tiny_unet()
    lora = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    lora = jax.tree.map(lambda x: x + 0.03 if getattr(x, 'ndim', 0) >= 2 else x, lora)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.cross_attention_dim))
    base, _ = unet_forward(params, lat, jnp.array([3]), ctx, cfg, use_flash=False, remat=False)
    full, _ = unet_forward(
        merge_lora(params, lora, scale=1.0), lat, jnp.array([3]), ctx, cfg,
        use_flash=False, remat=False,
    )
    # scale=0 == base
    zero, _ = unet_forward(
        merge_lora(params, lora, scale=0.0), lat, jnp.array([3]), ctx, cfg,
        use_flash=False, remat=False,
    )
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base), atol=1e-6)
    assert not np.allclose(np.asarray(full), np.asarray(base), atol=1e-5)


def test_kohya_key_names():
    cfg, params = _tiny_unet()
    lora = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    sd = kohya_state_dict(unet_lora=lora)
    keys = sorted(sd.keys())
    # canonical kohya naming ComfyUI/A1111 expect (reference export contract,
    # trainer/checkpoint.py:84-102)
    assert any(
        k == "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight"
        for k in keys
    ), keys[:5]
    assert any(k.startswith("lora_unet_down_blocks_0_resnets_0_conv2.") for k in keys)
    assert any(k.endswith(".alpha") for k in keys)
    for k in keys:
        assert not k.startswith("lora_unet_base_model"), "peft prefix must not leak"
    # alpha == rank
    a = sd["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha"]
    assert float(a) == 4.0
    # torch layouts: linear down [r, in]; conv down [r, in, kh, kw]
    d = sd["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight"]
    assert d.shape[0] == 4
    c = sd["lora_unet_down_blocks_0_resnets_0_conv2.lora_down.weight"]
    assert c.shape[:2] == (4, 32) and c.shape[2:] == (3, 3)


def test_kohya_roundtrip():
    cfg, params = _tiny_unet()
    lora = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    lora = jax.tree.map(lambda x: x + 0.01 if getattr(x, 'ndim', 0) >= 2 else x, lora)
    sd = kohya_state_dict(unet_lora=lora)
    back, te_back = load_kohya_state_dict(sd, params, [None, None])
    la = jax.tree_util.tree_flatten(lora)[0]
    lb = jax.tree_util.tree_flatten(back)[0]
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32), np.asarray(y, np.float32), atol=1e-6)


def test_lora_linear_matches_peft():
    """Golden: our dense+lora == peft's LoRA Linear with identical weights."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from peft import LoraConfig, get_peft_model

    n_in, n_out, rank, alpha = 16, 24, 4, 8.0

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(n_in, n_out)

        def forward(self, x):
            return self.proj(x)

    model = M()
    base_w = model.proj.weight.detach().clone()
    base_b = model.proj.bias.detach().clone()
    peft_model = get_peft_model(
        model, LoraConfig(r=rank, lora_alpha=alpha, target_modules=["proj"])
    )
    layer = peft_model.base_model.model.proj
    with torch.no_grad():
        layer.lora_A["default"].weight.normal_(0, 0.25)
        layer.lora_B["default"].weight.normal_(0, 0.25)

    x = torch.randn(3, n_in)
    with torch.no_grad():
        expected = peft_model(x).numpy()

    p = {
        "kernel": jnp.asarray(base_w.numpy().T),
        "bias": jnp.asarray(base_b.numpy()),
        "lora": {
            "a": jnp.asarray(layer.lora_A["default"].weight.detach().numpy().T),
            "b": jnp.asarray(layer.lora_B["default"].weight.detach().numpy().T),
            "alpha": alpha,
        },
    }
    ours = dense(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_dora_magnitude_init_and_effect():
    cfg, params = _tiny_unet()
    lora = create_lora_params(
        jax.random.PRNGKey(1), params, rank=4, targets=("to_q",), use_dora=True
    )
    leaves = jax.tree_util.tree_leaves(lora)
    # contains magnitude vectors initialized to base column norms
    found = False

    def walk(t):
        nonlocal found
        if isinstance(t, dict):
            if "magnitude" in t:
                found = True
            for v in t.values():
                if isinstance(v, dict):
                    walk(v)

    walk(lora)
    assert found
    # with b=0 and magnitude=||W||, DoRA output == base output
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.cross_attention_dim))
    base_out, _ = unet_forward(params, lat, jnp.array([3]), ctx, cfg, use_flash=False, remat=False)
    out, _ = unet_forward(
        inject_lora(params, lora), lat, jnp.array([3]), ctx, cfg, use_flash=False, remat=False
    )
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(out), atol=1e-4)


def test_blora_target_blocks_restrict_injection():
    """B-LoRA style block targeting (reference optimizer.py:51-71): adapters
    only in the named block prefixes."""
    cfg, params = _tiny_unet()
    lora = create_lora_params(
        jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS,
        target_blocks=("up_blocks.0",),
    )
    from sd_lora_trainer_tpu.models.lora import _lora_leaves

    paths = [p for p, _ in _lora_leaves(lora)]
    assert paths, "no adapters injected"
    assert all(p.startswith("up_blocks.0") for p in paths), paths
    full = create_lora_params(jax.random.PRNGKey(1), params, rank=4, targets=UNET_TARGETS)
    assert len(paths) < len([p for p, _ in _lora_leaves(full)])
