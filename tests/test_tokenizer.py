"""CLIP BPE tokenizer tests (synthetic vocab; golden vs transformers when a
real vocab is available on disk)."""

import numpy as np

from sd_lora_trainer_tpu.models.tokenizer import (
    CLIPTokenizer,
    build_test_vocab,
    bytes_to_unicode,
)


def _tok(**kw):
    vocab, merges = build_test_vocab(extra_words=["photo", "cat", "style"], **{k: v for k, v in kw.items() if k == "n_merges"})
    return CLIPTokenizer(vocab, merges)


def test_byte_unicode_table_is_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_encode_basic_structure():
    tok = _tok()
    ids = tok.encode("a photo of a cat")
    assert ids[0] == tok.bos_token_id
    assert ids[-1] == tok.eos_token_id
    assert len(ids) <= 77


def test_merged_words_tokenize_to_single_token():
    tok = _tok()
    ids = tok.encode("photo")
    # 'photo' was built into the vocab with merges -> exactly [bos, photo</w>, eos]
    assert len(ids) == 3
    assert tok.decoder.get(ids[1]) == "photo</w>"


def test_call_pads_to_77():
    tok = _tok()
    batch = tok(["photo cat", "cat"])
    assert len(batch) == 2
    assert all(len(ids) == 77 for ids in batch)
    assert batch[0][-1] == tok.pad_token_id


def test_custom_pad_token():
    vocab, merges = build_test_vocab(extra_words=["hi"])
    tok = CLIPTokenizer(vocab, merges, pad_token_id=0)  # OpenCLIP-G style
    ids = tok(["hi"])[0]
    assert ids[-1] == 0
    assert tok.eos_token_id != 0


def test_added_special_tokens():
    tok = _tok()
    n = tok.add_special_tokens(["<s0>", "<s1>", "<s2>"])
    assert n == 3
    base = tok.vocab_size
    assert tok.convert_tokens_to_ids(["<s0>", "<s1>", "<s2>"]) == [base, base + 1, base + 2]
    ids = tok.encode("a photo of <s0><s1><s2>")
    assert base in ids and base + 1 in ids and base + 2 in ids
    # surrounding text still tokenizes
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id


def test_lowercase_and_whitespace_cleanup():
    tok = _tok()
    assert tok.encode("  PHOTO   cat ") == tok.encode("photo cat")


def test_deterministic():
    tok = _tok()
    assert tok.encode("photo of cat") == tok.encode("photo of cat")


def test_matches_transformers_tokenizer_if_vocab_available(tmp_path):
    """Golden parity using a vocab built from our synthetic tables saved in HF
    format then loaded with transformers' slow CLIPTokenizer."""
    import json

    import pytest

    transformers = pytest.importorskip("transformers")
    vocab, merges = build_test_vocab(extra_words=["photo", "cat"])
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    lines = ["#version: 0.2"] + [f"{a} {b}" for a, b in merges]
    (tmp_path / "merges.txt").write_text("\n".join(lines))
    try:
        hf_tok = transformers.CLIPTokenizer(
            str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
        )
    except Exception as e:  # pragma: no cover - ftfy or other deps missing
        pytest.skip(f"transformers CLIPTokenizer unavailable: {e}")

    from sd_lora_trainer_tpu.models.tokenizer import load_tokenizer

    ours = load_tokenizer(str(tmp_path))
    for text in ["a photo of cat", "photo", "cat photo!!", "x y z"]:
        np.testing.assert_array_equal(ours.encode(text), hf_tok.encode(text))
