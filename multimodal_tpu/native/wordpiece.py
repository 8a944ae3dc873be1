"""ctypes binding for the native WordPiece kernel.

Runs the greedy longest-match segmentation loop in C++
(``native/wordpiece_tokenizer.cpp``); splitting/lowercasing stays in Python.
Falls back to the pure-Python ``WordPieceTokenizer`` transparently when the
shared library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

from multimodal_tpu.examples.mugen.bert_text_transform import WordPieceTokenizer

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "wordpiece_tokenizer.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libwordpiece_tokenizer.so")


def _ensure_lib() -> Optional[ctypes.CDLL]:
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_encode_word.restype = ctypes.c_int
        lib.wp_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.wp_encode_text.restype = ctypes.c_int
        lib.wp_encode_text.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        return lib
    except (OSError, subprocess.CalledProcessError):
        return None


class NativeWordPieceTokenizer(WordPieceTokenizer):
    """Drop-in WordPieceTokenizer with the segmentation loop in C++."""

    def __init__(self, vocab: Sequence[str], **kwargs):
        super().__init__(vocab, **kwargs)
        self._lib = _ensure_lib()
        self._handle = None
        if self._lib is not None:
            blob = "\n".join(vocab).encode("utf-8")
            self._handle = self._lib.wp_create(
                blob, self.unk_token.encode("utf-8"), self.max_chars_per_word
            )

    def encode(self, text: str) -> List[int]:
        if self._handle is None or not text.isascii():
            # Non-ASCII text uses the Python path: its \w class is
            # Unicode-aware; the C++ fast path is ASCII-only by design.
            return super().encode(text)
        # One ctypes crossing per text: split + segment happen in C++.
        # Each emitted id consumes >=1 input char, so len(text) bounds out.
        cap = max(len(text), 1)
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.wp_encode_text(
            self._handle, text.encode("ascii"), int(self.lowercase), buf, cap
        )
        return list(buf[:n])

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.wp_destroy(self._handle)
