"""ctypes binding for the native C++ CLIP BPE tokenizer (csrc/clip_bpe.cpp).

Caption tokenization runs on the host every training step (caption dropout
forces re-tokenization), so it's the one host-side hot path worth going
native. `NativeCLIPTokenizer` is a drop-in for models/tokenizer.CLIPTokenizer
(same encode/__call__/add_special_tokens surface); `native_available()` gates
use and everything falls back to the pure-python implementation.

The shared library is built on demand with g++ -O2 and cached next to the
source; golden parity with the python tokenizer is enforced by tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "clip_bpe.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libclip_bpe.so")
_BUILD_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _load_library():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = os.path.abspath(_SRC)
        lib = os.path.abspath(_LIB_PATH)
        try:
            if (not os.path.exists(lib)) or os.path.getmtime(lib) < os.path.getmtime(src):
                subprocess.check_call(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", lib],
                    stderr=subprocess.DEVNULL,
                )
            handle = ctypes.CDLL(lib)
            handle.clip_bpe_create.restype = ctypes.c_void_p
            handle.clip_bpe_create.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_long,
            ]
            handle.clip_bpe_add_special.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            handle.clip_bpe_encode.restype = ctypes.c_int
            handle.clip_bpe_encode.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_int,
            ]
            handle.clip_bpe_destroy.argtypes = [ctypes.c_void_p]
            _LIB = handle
        except Exception as e:  # no toolchain / unsupported platform
            print(f"[tokenizer_native] build/load failed ({e}); using python tokenizer")
            _LIB_FAILED = True
    return _LIB


def native_available() -> bool:
    return _load_library() is not None


class NativeCLIPTokenizer:
    """Same surface as models/tokenizer.CLIPTokenizer, C++ inside."""

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: List[Tuple[str, str]],
        max_length: int = 77,
        pad_token_id: Optional[int] = None,
    ):
        lib = _load_library()
        assert lib is not None, "native tokenizer unavailable"
        self._lib = lib
        self.max_length = max_length
        self.encoder = dict(vocab)
        self.bos_token_id = vocab["<|startoftext|>"]
        self.eos_token_id = vocab["<|endoftext|>"]
        self.pad_token_id = self.eos_token_id if pad_token_id is None else pad_token_id
        self.added_tokens: Dict[str, int] = {}

        vocab_tsv = "\n".join(f"{tok}\t{idx}" for tok, idx in vocab.items())
        merges_txt = "\n".join(f"{a} {b}" for a, b in merges)
        self._handle = lib.clip_bpe_create(
            vocab_tsv.encode("utf-8"),
            merges_txt.encode("utf-8"),
            max_length,
            -1 if pad_token_id is None else pad_token_id,
        )
        self._buf = (ctypes.c_long * max_length)()

    def __del__(self):
        try:
            self._lib.clip_bpe_destroy(self._handle)
        except Exception:
            pass

    def __len__(self):
        return len(self.encoder) + len(self.added_tokens)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def add_special_tokens(self, tokens: List[str]) -> int:
        added = 0
        for tok in tokens:
            if tok in self.encoder or tok in self.added_tokens:
                continue
            self.added_tokens[tok] = len(self.encoder) + len(self.added_tokens)
            self._lib.clip_bpe_add_special(self._handle, tok.lower().encode("utf-8"))
            added += 1
        return added

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        out = []
        for tok in tokens:
            if tok in self.added_tokens:
                out.append(self.added_tokens[tok])
            elif tok in self.encoder:
                out.append(self.encoder[tok])
            else:
                raise KeyError(f"Unknown token: {tok}")
        return out

    def encode(self, text: str) -> List[int]:
        n = self._lib.clip_bpe_encode(self._handle, text.encode("utf-8"), self._buf, 0)
        return list(self._buf[:n])

    def __call__(self, texts) -> List[List[int]]:
        if isinstance(texts, str):
            texts = [texts]
        out = []
        for text in texts:
            self._lib.clip_bpe_encode(self._handle, text.encode("utf-8"), self._buf, 1)
            out.append(list(self._buf[: self.max_length]))
        return out
