"""Inference helper tests: prompt rewriting policy and token-scale blending
(reference: trainer/inference.py:40-127, :180-227)."""

import json

import numpy as np
import pytest

from sd_lora_trainer_tpu.inference import compute_token_scale, prepare_prompt_for_lora
from sd_lora_trainer_tpu.utils.utils import fix_prompt, replace_in_string


@pytest.fixture()
def lora_dir(tmp_path):
    (tmp_path / "special_params.json").write_text(json.dumps({"TOK": "<s0><s1><s2>"}))
    (tmp_path / "training_args.json").write_text(
        json.dumps(
            {
                "name": "banny",
                "concept_mode": "object",
                "training_attributes": {"trigger_text": "TOK, "},
            }
        )
    )
    return str(tmp_path)


def _set_mode(lora_dir, mode, trigger="TOK, "):
    args = json.load(open(f"{lora_dir}/training_args.json"))
    args["concept_mode"] = mode
    args["training_attributes"]["trigger_text"] = trigger
    json.dump(args, open(f"{lora_dir}/training_args.json", "w"))


def test_concept_placeholder_replaced(lora_dir):
    out = prepare_prompt_for_lora("a photo of <concept> on a beach", lora_dir)
    assert "<concept>" not in out
    assert "<s0><s1><s2>" in out


def test_lora_name_replaced(lora_dir):
    out = prepare_prompt_for_lora("a photo of <banny> flying", lora_dir)
    assert "banny" not in out.lower()
    assert "<s0><s1><s2>" in out


def test_trigger_prepended_when_absent(lora_dir):
    out = prepare_prompt_for_lora("a castle at night", lora_dir)
    assert out.startswith("<s0><s1><s2>")


def test_style_mode_policy(lora_dir):
    _set_mode(lora_dir, "style", trigger="in the style of TOK, ")
    out = prepare_prompt_for_lora("a mountain lake", lora_dir)
    assert out.startswith("in the style of <s0><s1><s2>")
    out2 = prepare_prompt_for_lora("a poster in the style of <concept>, bold colors", lora_dir)
    assert "in the style of <s0><s1><s2>" in out2
    assert out2.count("in the style of") == 1


def test_no_token_path_passthrough():
    assert prepare_prompt_for_lora("hello", "/some/path_no_token") == "hello"


def test_old_checkpoint_raises(tmp_path):
    with pytest.raises(ValueError, match="deprecated"):
        prepare_prompt_for_lora("x", str(tmp_path))


def test_token_scale_curve():
    # token_scale = 0.5 + 0.5 * lora_scale**0.4 (inference.py:180-205)
    np.testing.assert_allclose(compute_token_scale(0.0), 0.5)
    np.testing.assert_allclose(compute_token_scale(1.0), 1.0)
    mid = compute_token_scale(0.75)
    np.testing.assert_allclose(mid, 0.5 + 0.5 * 0.75**0.4, rtol=1e-6)
    # monotone
    scales = [compute_token_scale(s) for s in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert all(b > a for a, b in zip(scales, scales[1:]))


def test_replace_in_string_iterates_to_fixpoint():
    out = replace_in_string("aaa", {"aa": "a"})
    assert out == "a"


def test_fix_prompt_cleanup():
    # identical outputs to the reference fix_prompt (utils.py:39-47)
    assert fix_prompt("a,,b") == "a, b"
    assert fix_prompt("  hello   world , ") == "hello world,"
    assert fix_prompt("a . b") == "a. b"
