"""ctypes binding for the native JPEG decode stage.

Host half of the fused "decode -> resize -> normalize -> patchify" pipeline
(SURVEY north star): ``native/jpeg_decoder.cpp`` decodes with libjpeg at the
smallest DCT scale covering the staging shape and box-resizes to a fixed
(H, W, 3) uint8 staging batch; the device half (bicubic resize to model
resolution, crop, normalize, bf16 cast — ``ops/image.py``) runs jitted on
the TPU, where the patchify conv fuses with the normalize.

Falls back to PIL transparently if the shared library cannot be built.
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "jpeg_decoder.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libjpeg_decoder.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC,
                 "-ljpeg", "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.mmtpu_decode_jpeg_batch.restype = ctypes.c_int
        lib.mmtpu_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.mmtpu_decode_jpeg_batch_mt.restype = ctypes.c_int
        lib.mmtpu_decode_jpeg_batch_mt.argtypes = (
            lib.mmtpu_decode_jpeg_batch.argtypes + [ctypes.c_int]
        )
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def _decode_pil(blobs: List[bytes], height: int, width: int) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(blobs), height, width, 3), np.uint8)
    for i, blob in enumerate(blobs):
        with Image.open(io.BytesIO(blob)) as im:
            im = im.convert("RGB").resize((width, height), Image.BILINEAR)
            out[i] = np.asarray(im)
    return out


def decode_jpeg_batch(
    blobs: List[bytes],
    height: int = 256,
    width: int = 256,
    n_threads: int = 0,
) -> np.ndarray:
    """Decode a list of JPEG byte strings to a (N, height, width, 3) uint8
    staging batch (aspect squashed; crop policy happens on device).

    ``n_threads=0`` uses every core (images decode independently — on a real
    TPU-VM host this parallelizes linearly); 1 forces single-threaded."""
    lib = _ensure_lib()
    if lib is None:
        return _decode_pil(blobs, height, width)
    n = len(blobs)
    out = np.empty((n, height, width, 3), np.uint8)
    blob_ptrs = (ctypes.c_char_p * n)(*blobs)
    sizes = (ctypes.c_long * n)(*[len(b) for b in blobs])
    if n_threads == 0:
        n_threads = os.cpu_count() or 1
    rc = lib.mmtpu_decode_jpeg_batch_mt(
        ctypes.cast(blob_ptrs, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(sizes, ctypes.POINTER(ctypes.c_long)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height,
        width,
        n_threads,
    )
    if rc != 0:
        return _decode_pil(blobs, height, width)
    return out


def native_jpeg_available() -> bool:
    return _ensure_lib() is not None
