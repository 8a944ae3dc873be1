"""MUGEN audio loading (third dataset modality).

Parity surface: reference ``examples/mugen/data/audio_utils.py`` +
``mugen_dataset.py:226`` (``get_game_audio``): each 3.2 s coinrun video has
a paired stereo track, loaded at 22050 Hz and returned as (samples,
channels) float32. The reference decodes arbitrary containers through PyAV
(ffmpeg); this host pipeline reads 16/32-bit PCM ``.wav`` via the stdlib
``wave`` module or pre-extracted ``.npy`` float arrays (the TPU-input-
pipeline setup: transcode once offline, read dense arrays at train time),
with linear-interpolation resampling to the target rate.
"""

from __future__ import annotations

import os
import wave
from typing import Optional

import numpy as np

# constants from MUGEN's audio VQVAE hparams (reference audio_utils.py:12-14)
AUDIO_SAMPLE_RATE = 22050
AUDIO_SAMPLE_LENGTH = int(AUDIO_SAMPLE_RATE * 3.2)  # each video is 3.2 s


def _read_wav(path: str):
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return data.reshape(-1, n_channels), rate


def resample_audio(data: np.ndarray, rate: int, target_rate: int) -> np.ndarray:
    """Linear-interpolation resample of (samples, channels) to target_rate."""
    if rate == target_rate:
        return data
    n_out = int(round(len(data) * target_rate / rate))
    t_in = np.arange(len(data), dtype=np.float64) / rate
    t_out = np.arange(n_out, dtype=np.float64) / target_rate
    return np.stack(
        [np.interp(t_out, t_in, data[:, c]) for c in range(data.shape[1])],
        axis=1,
    ).astype(np.float32)


def load_audio(
    path: str,
    sr: int = AUDIO_SAMPLE_RATE,
    duration: Optional[int] = AUDIO_SAMPLE_LENGTH,
    offset: int = 0,
) -> np.ndarray:
    """Load audio as (samples, channels) float32 at sample rate ``sr``,
    seeked to ``offset`` samples and padded/trimmed to ``duration`` samples
    (reference ``load_audio`` semantics, ``get_game_audio``'s (L, C) layout).

    Accepts 16/32-bit PCM ``.wav`` or ``.npy`` ((samples,) or
    (samples, channels) float; assumed already at ``sr``).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        data = np.asarray(np.load(path), np.float32)
        if data.ndim == 1:
            data = data[:, None]
        rate = sr
    elif ext == ".wav":
        data, rate = _read_wav(path)
    else:
        raise ValueError(f"unsupported audio file {path} (use .wav or .npy)")
    data = resample_audio(data, rate, sr)
    if offset:
        data = data[offset:]
    if duration is not None:
        if len(data) < duration:
            data = np.pad(data, ((0, duration - len(data)), (0, 0)))
        else:
            data = data[:duration]
    return data
