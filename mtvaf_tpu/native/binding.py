"""ctypes bindings for the native runtime library.

Builds on demand (``make`` in this directory) and degrades gracefully: every
native entry point has a pure-Python fallback, and the native tokenizer
routes non-ASCII words back through the Python tokenizer to keep exact
Unicode semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmtvaf_native.so")
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:  # noqa: BLE001
        return False


def load_library(build: bool = True):
    """Load (building if needed) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and (not build or not _build()):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_encode_words.restype = ctypes.c_int
        lib.wp_encode_words.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.img_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


class NativeWordPiece:
    """Batch word tokenizer backed by the C++ library.

    Produces, for a list of whitespace-split words, the flat subtoken id list
    and per-word subtoken offsets — exactly the layout feature conversion
    needs (tok_to_orig_index / orig_to_tok_index).
    """

    def __init__(self, py_tokenizer):
        self.py = py_tokenizer
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self.lib = lib
        # Order tokens by id so native indices equal python vocab ids
        # (handles any id mapping, including holes).
        max_id = max(py_tokenizer.vocab.values())
        by_id = ["\x01unused%d" % i for i in range(max_id + 1)]
        for tok, idx in py_tokenizer.vocab.items():
            by_id[idx] = tok
        blob = "\n".join(by_id).encode("utf-8")
        self.handle = lib.wp_create(blob, 1 if
                                    py_tokenizer.basic_tokenizer.do_lower_case
                                    else 0)
        self.inv_vocab = py_tokenizer.inv_vocab

    def __del__(self):
        if getattr(self, "handle", None) and load_library(build=False):
            self.lib.wp_free(self.handle)

    def encode_words(self, words: Sequence[str]):
        """words → (ids: List[int], word_start: List[int])."""
        ascii_ok = all(w.isascii() and "[" not in w for w in words)
        if not ascii_ok:
            ids: List[int] = []
            starts: List[int] = []
            for w in words:
                starts.append(len(ids))
                ids.extend(self.py.convert_tokens_to_ids(self.py.tokenize(w)))
            starts.append(len(ids))
            return ids, starts

        blob = "\n".join(words).encode("utf-8")
        cap = max(64, 8 * len(words))
        while True:
            out_ids = np.empty(cap, np.int32)
            out_starts = np.empty(len(words) + 1, np.int32)
            n = self.lib.wp_encode_words(
                self.handle, blob, len(words),
                out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                cap)
            if n >= 0:
                return out_ids[:n].tolist(), out_starts.tolist()
            cap = -n  # needed capacity

    def tokenize_word(self, word: str) -> List[str]:
        ids, _ = self.encode_words([word])
        return [self.inv_vocab[i] for i in ids]


class AcceleratedTokenizer:
    """Drop-in FullTokenizer facade routing .tokenize through the native
    batch tokenizer (ASCII fast path, Python fallback otherwise)."""

    def __init__(self, py_tokenizer):
        self._py = py_tokenizer
        self._native = NativeWordPiece(py_tokenizer)
        self.vocab = py_tokenizer.vocab
        self.inv_vocab = py_tokenizer.inv_vocab
        self.basic_tokenizer = py_tokenizer.basic_tokenizer
        self.cls_token = py_tokenizer.cls_token
        self.sep_token = py_tokenizer.sep_token

    def tokenize(self, text: str):
        # "[" routes to python: special tokens like [SEP] must never split
        # (the C++ fast path does plain ASCII punctuation splitting).
        if text.isascii() and "[" not in text:
            ids, _ = self._native.encode_words(text.split())
            return [self.inv_vocab[i] for i in ids]
        return self._py.tokenize(text)

    def convert_tokens_to_ids(self, tokens):
        return self._py.convert_tokens_to_ids(tokens)

    def convert_ids_to_tokens(self, ids):
        return self._py.convert_ids_to_tokens(ids)


def maybe_accelerate(tokenizer):
    """Wrap a FullTokenizer with the native fast path when the library builds;
    otherwise return it unchanged."""
    from ..data.tokenization import FullTokenizer
    if not isinstance(tokenizer, FullTokenizer) or load_library() is None:
        return tokenizer
    try:
        return AcceleratedTokenizer(tokenizer)
    except Exception:  # noqa: BLE001
        return tokenizer


def native_preprocess(img: np.ndarray, *, crop: int = 224,
                      resize_short: int = 256, top: int = -1, left: int = -1,
                      hflip: bool = False,
                      mean=None, std=None) -> Optional[np.ndarray]:
    """uint8 HWC RGB → normalized float32 (crop, crop, 3), or None if the
    native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    from ..data.images import IMAGENET_MEAN, IMAGENET_STD
    mean = np.asarray(IMAGENET_MEAN if mean is None else mean, np.float32)
    std = np.asarray(IMAGENET_STD if std is None else std, np.float32)
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((crop, crop, 3), np.float32)
    lib.img_preprocess(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        crop, resize_short, top, left, 1 if hflip else 0,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
