"""ctypes binding for the native (C++) data-pipeline kernels.

Builds/loads ``_native/libmagdata.so`` (see _native/magdata.cc). The native
tokenizer accelerates the reference's per-word tokenize/inversions hot loop
(multimodal_driver.py:89-103); the pure-Python WordPieceTokenizer is the
behavioral reference and automatic fallback when the shared library is
unavailable or the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmagdata.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "magdata.cc")


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library with g++ if needed. Returns the .so path
    or None if the build fails (callers fall back to Python)."""
    if os.path.exists(_SO_PATH) and not force:
        if os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
            return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
             _SRC_PATH, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except Exception:
        return None


_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.mag_tokenizer_new.restype = ctypes.c_void_p
    lib.mag_tokenizer_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.mag_tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.mag_tokenize_words.restype = ctypes.c_int
    lib.mag_tokenize_words.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeWordPieceTokenizer:
    """Native-accelerated WordPiece with the same word-level API the data
    pipeline consumes. Wraps a Python WordPieceTokenizer for its vocab and
    special tokens; tokenize_words_to_ids runs in C++."""

    def __init__(self, py_tokenizer):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.py = py_tokenizer
        self.vocab = py_tokenizer.vocab
        self.cls_token = py_tokenizer.cls_token
        self.sep_token = py_tokenizer.sep_token
        self.pad_token_id = py_tokenizer.pad_token_id
        self.vocab_size = py_tokenizer.vocab_size

        tokens = [None] * len(self.vocab)
        for tok, i in self.vocab.items():
            tokens[i] = tok.encode("utf-8")
        arr = (ctypes.c_char_p * len(tokens))(*tokens)
        unk_id = self.vocab[py_tokenizer.unk_token]
        self._handle = lib.mag_tokenizer_new(
            arr, len(tokens), unk_id,
            1 if py_tokenizer.basic.do_lower_case else 0)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle and getattr(self, "_lib", None) is not None:
            self._lib.mag_tokenizer_free(handle)
            self._handle = None

    # Python-API passthroughs used by packing (specials etc.)
    def tokenize(self, text: str) -> List[str]:
        return self.py.tokenize(text)

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        return self.py.convert_tokens_to_ids(tokens)

    def tokenize_words_to_ids(
        self, words: Sequence[str]
    ) -> Tuple[List[int], List[int]]:
        """Tokenize a word list → (token_ids, word_indices). The word
        indices are the reference's `inversions` for modality alignment.

        The C++ kernel implements the printable-ASCII path only (no
        accent stripping / unicode punctuation / control-char cleaning);
        any word with non-ASCII bytes OR ASCII control chars (the Python
        `_clean` removes those in-word, and an embedded NUL would
        truncate at the ctypes char* boundary) is routed through the
        Python tokenizer so results are byte-identical on all inputs
        regardless of toolchain availability."""
        if any(ord(c) > 127 or ord(c) < 32 or ord(c) == 127
               for w in words for c in w):
            ids: List[int] = []
            inv: List[int] = []
            for w_idx, word in enumerate(words):
                pieces = self.py.tokenize(word)
                ids.extend(self.py.convert_tokens_to_ids(pieces))
                inv.extend([w_idx] * len(pieces))
            return ids, inv
        enc = [w.encode("utf-8") for w in words]
        arr = (ctypes.c_char_p * len(enc))(*enc)
        cap = max(64, 8 * sum(len(w) for w in words) + 8 * len(words))
        while True:
            ids = (ctypes.c_int * cap)()
            inv = (ctypes.c_int * cap)()
            n = self._lib.mag_tokenize_words(
                self._handle, arr, len(enc), ids, inv, cap)
            if n >= 0:
                return list(ids[:n]), list(inv[:n])
            cap *= 2
