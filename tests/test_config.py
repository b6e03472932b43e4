"""Config derivation tests (reference semantics: trainer/config.py:121-166)."""

from sd_lora_trainer_tpu.config import TrainingConfig


def _cfg(**kw):
    base = dict(
        lora_training_urls="data/some_dataset.zip",
        concept_mode="style",
        sd_model_version="sd15",
        _testing_no_output_dir=True,
    )
    base.update(kw)
    return TrainingConfig(**base)


def test_token_list_derived_from_n_tokens():
    cfg = _cfg(n_tokens=2)
    assert cfg.inserting_list_tokens == ["<s0>", "<s1>"]
    assert cfg.token_dict == {"TOK": "<s0><s1>"}


def test_face_mode_overrides():
    cfg = _cfg(concept_mode="face", left_right_flip_augmentation=True)
    assert cfg.left_right_flip_augmentation is False
    assert cfg.mask_target_prompts == "face"


def test_dora_overrides():
    cfg = _cfg(use_dora=True, l1_penalty=0.5, lora_weight_decay=0.1)
    assert cfg.l1_penalty == 0.0
    assert cfg.lora_weight_decay == 0.0
    assert cfg.text_encoder_lora_weight_decay == 0.0


def test_checkpointing_steps_coercion():
    cfg = _cfg(checkpointing_steps=0, max_train_steps=123)
    assert cfg.checkpointing_steps == 123


def test_warmup_default_is_max_steps():
    cfg = _cfg(max_train_steps=77)
    assert cfg.unet_lr_warmup_steps == 77


def test_name_from_training_urls_and_sanitized():
    cfg = _cfg(lora_training_urls="https://host/my set (v2).zip")
    # identical output to the reference's remove_delimiter_characters
    assert cfg.name == "my_set_v2_.zip"


def test_json_roundtrip(tmp_path):
    cfg = _cfg(seed=42, lora_rank=8)
    p = tmp_path / "cfg.json"
    cfg.save_as_json(str(p))
    import json

    data = json.loads(p.read_text())
    assert data["lora_rank"] == 8
    assert data["seed"] == 42


def test_accepts_reference_config_files():
    """Old reference train_configs must parse (ignoring cuda-only fields)."""
    cfg = TrainingConfig(
        name="banny",
        sd_model_version="sdxl",
        lora_training_urls="https://example.com/banny_best.zip",
        concept_mode="object",
        sample_imgs_lora_scale=0.75,
        seed=0,
        resolution=512,
        train_batch_size=4,
        n_sample_imgs=8,
        max_train_steps=300,
        checkpointing_steps=200,
        disable_ti=False,
        caption_model="florence",
        ti_lr=0.001,
        unet_lr=0.0003,
        lora_rank=16,
        debug=True,
        device="cuda:0",  # cuda-only field: accepted, ignored
        _testing_no_output_dir=True,
    )
    assert cfg.sd_model_version == "sdxl"
    assert cfg.pretrained_model["version"] == "sdxl"


def test_quantize_base_auto_resolution():
    """quantize_base="auto" promotes the round-5 measured winner (int8 base
    for SDXL LoRA) and stays off wherever the lever is a no-op or a loss."""
    assert _cfg(sd_model_version="sdxl").resolve_quantize_base() == "int8"
    # SD15's auto remat plan is OFF at <=512px: nothing to free
    assert _cfg().resolve_quantize_base() == "none"
    # full finetune trains the base; tp shards bf16 kernel shapes
    assert _cfg(sd_model_version="sdxl", is_lora=False).resolve_quantize_base() == "none"
    assert (
        _cfg(sd_model_version="sdxl", sharding_mode="tp").resolve_quantize_base()
        == "none"
    )
    # explicit values pass through (modulo the same guards)
    assert _cfg(quantize_base="none").resolve_quantize_base() == "none"
    assert _cfg(quantize_base="int8+te").resolve_quantize_base() == "int8+te"
    assert (
        _cfg(quantize_base="int8", is_lora=False).resolve_quantize_base() == "none"
    )


def test_remat_auto_follows_quantize_base():
    """StepConfig.from_config: the int8 base buys the lighter remat plan
    (round-5 winner); bf16 SDXL keeps full block remat + flash saves."""
    from sd_lora_trainer_tpu.training.step import StepConfig

    sdxl = _cfg(sd_model_version="sdxl", resolution=1024)
    sc = StepConfig.from_config(sdxl, 1.0)
    assert sc.remat == "light+save:flash_out*,flash_lse*"
    bf16 = _cfg(sd_model_version="sdxl", resolution=1024, quantize_base="none")
    assert StepConfig.from_config(bf16, 1.0).remat == "save:flash_out*,flash_lse*"
    # SD15 <=512px stays remat-off regardless
    sd15 = _cfg(resolution=512)
    assert StepConfig.from_config(sd15, 1.0).remat is False
    # int8+te implies the conditioning remat
    te = _cfg(sd_model_version="sdxl", resolution=1024, quantize_base="int8+te")
    sc_te = StepConfig.from_config(te, 1.0)
    assert sc_te.remat_te and sc_te.remat == "light+save:flash_out*,flash_lse*"
