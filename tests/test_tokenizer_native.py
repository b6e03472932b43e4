"""Golden parity: the native C++ tokenizer vs the pure-python reference."""

import numpy as np
import pytest

from sd_lora_trainer_tpu.models.tokenizer import (
    CLIPTokenizer,
    build_sized_test_vocab,
    build_test_vocab,
)
from sd_lora_trainer_tpu.models.tokenizer_native import (
    NativeCLIPTokenizer,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ toolchain unavailable")

CORPUS = [
    "a photo of a cat",
    "PHOTO   with   extra   spaces  ",
    "it's the cat's photo, isn't it?",
    "style!!! punctuation... and_underscores --- 123 456",
    "a photo of <s0><s1><s2> in the style of tok",
    "",
    "'s 't 're 've 'm 'll 'd",
    "numbers 0 1 22 333 4444",
    "mixed: photo2go, cat-dog, a.b.c",
]


def _pair(pad=None, extra=("photo", "cat", "style")):
    vocab, merges = build_test_vocab(extra_words=list(extra))
    py = CLIPTokenizer(vocab, merges, pad_token_id=pad)
    cc = NativeCLIPTokenizer(vocab, merges, pad_token_id=pad)
    return py, cc


def test_encode_parity():
    py, cc = _pair()
    for text in CORPUS:
        assert cc.encode(text) == py.encode(text), text


def test_call_padding_parity():
    py, cc = _pair()
    np.testing.assert_array_equal(np.asarray(cc(CORPUS)), np.asarray(py(CORPUS)))


def test_custom_pad_parity():
    py, cc = _pair(pad=0)
    np.testing.assert_array_equal(np.asarray(cc(["a cat"])), np.asarray(py(["a cat"])))


def test_added_tokens_parity():
    py, cc = _pair()
    toks = ["<s0>", "<s1>", "<s2>"]
    assert py.add_special_tokens(toks) == cc.add_special_tokens(toks) == 3
    assert py.convert_tokens_to_ids(toks) == cc.convert_tokens_to_ids(toks)
    for text in ["a photo of <s0><s1><s2>", "<s0> alone", "photo <s2> cat <s0>"]:
        assert cc.encode(text) == py.encode(text), text
    np.testing.assert_array_equal(
        np.asarray(cc(["a photo of <s0><s1><s2>"])), np.asarray(py(["a photo of <s0><s1><s2>"]))
    )


def test_sized_vocab_parity():
    vocab, merges = build_sized_test_vocab(256, extra_words=["photo"])
    py = CLIPTokenizer(vocab, merges)
    cc = NativeCLIPTokenizer(vocab, merges)
    for text in CORPUS:
        assert cc.encode(text) == py.encode(text), text


def test_truncation_parity():
    py, cc = _pair()
    long_text = "word " * 200
    assert cc.encode(long_text) == py.encode(long_text)
    assert len(cc.encode(long_text)) == 77
