"""ctypes binding for the native BPE merge kernel.

Accelerates ``CLIPBPETokenizer`` by running the per-word merge loop + vocab
lookup in C++ (``native/bpe_tokenizer.cpp``); pre-tokenization (the
``\\p{L}`` regex and the byte→unicode mapping) stays in Python. Falls back
to the pure-Python tokenizer transparently if the shared library cannot be
built/loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from multimodal_tpu.transforms.clip_transform import CLIPBPETokenizer

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "bpe_tokenizer.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libbpe_tokenizer.so")


def _ensure_lib() -> Optional[ctypes.CDLL]:
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode_word.restype = ctypes.c_int
        lib.bpe_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        return lib
    except (OSError, subprocess.CalledProcessError):
        return None


class NativeCLIPBPETokenizer(CLIPBPETokenizer):
    """Drop-in CLIPBPETokenizer with the merge loop in C++."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._lib = _ensure_lib()
        self._handle = None
        if self._lib is not None:
            merges = "\n".join(
                f"{a} {b}" for (a, b), _ in sorted(
                    self.bpe_ranks.items(), key=lambda kv: kv[1]
                )
            )
            vocab = "\n".join(
                tok for tok, _ in sorted(self.encoder.items(), key=lambda kv: kv[1])
            )
            self._handle = self._lib.bpe_create(
                merges.encode("utf-8"), vocab.encode("utf-8")
            )
        self._buf = (ctypes.c_int32 * 512)()

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def encode(self, text: str) -> List[int]:
        if self._handle is None:
            return super().encode(text)
        import regex as re

        ids: List[int] = []
        text = text.lower().strip()
        for token in re.findall(self.pat, text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            n = self._lib.bpe_encode_word(
                self._handle, mapped.encode("utf-8"), self._buf, 512
            )
            if n < 0:
                # unknown symbol or overflow: fall back for this word
                ids.extend(
                    self.encoder[s] for s in self._merge_word(mapped).split(" ")
                )
            else:
                ids.extend(self._buf[:n])
        return ids

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.bpe_destroy(self._handle)
