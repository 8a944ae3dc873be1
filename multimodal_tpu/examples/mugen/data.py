"""MUGEN (coinrun) dataset layer.

Parity surface: reference ``examples/mugen/data/mugen_dataset.py`` +
``mugen_datamodules.py`` — release-JSON metadata (``{split}.json`` with
``data[i].video.num_frames`` / ``data[i].annotations[j].text``), the
too-short-clip filter, every-n frame sampling with fixed or random start,
and text annotation selection (first/random).

The reference renders frames on the host from coinrun game JSONs + art
assets (~1.5k LoC of game engine). That renderer is host tooling orthogonal
to the framework; here clips come from pre-rendered ``{id}.npy`` arrays
((T, H, W, 3) uint8) in ``frames_dir`` — the standard setup for TPU input
pipelines, where rendering happens once offline and training reads dense
arrays. On-device resize/normalize stays in ``transforms/video_transform``.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from multimodal_tpu.data.datamodules import DataModule


class MUGENDataModule(DataModule):
    """{video (S, H, W, 3) float32 in [0,1], text (L,) int32} batches."""

    def __init__(
        self,
        data_path: str,
        frames_dir: str,
        split: str = "train",
        text_transform: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        sequence_length: int = 32,
        sample_every_n_frames: int = 3,
        fixed_start_idx: bool = True,
        random_text: bool = False,
        text_len: int = 32,
        get_audio: bool = False,
        audio_dir: Optional[str] = None,
        audio_sample_rate: Optional[int] = None,
        audio_sample_length: Optional[int] = None,
        audio_transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        **kwargs,
    ):
        with open(os.path.join(data_path, f"{split}.json")) as f:
            all_data = json.load(f)
        self.metadata = all_data.get("metadata", {})
        min_frames = (sequence_length - 1) * sample_every_n_frames
        data = [
            d for d in all_data["data"] if d["video"]["num_frames"] > min_frames
        ]
        super().__init__(data, **kwargs)
        self.frames_dir = frames_dir
        self.text_transform = text_transform
        self.sequence_length = sequence_length
        self.sample_every_n_frames = sample_every_n_frames
        self.fixed_start_idx = fixed_start_idx
        self.random_text = random_text
        self.text_len = text_len
        # audio modality (reference mugen_dataset.py:226 get_game_audio):
        # {id}.wav / {id}.npy stereo tracks next to the frames, loaded at
        # 22050 Hz x 3.2 s by default (examples/mugen/audio_utils.py)
        self.get_audio = get_audio
        self.audio_dir = audio_dir if audio_dir is not None else frames_dir
        from multimodal_tpu.examples.mugen.audio_utils import (
            AUDIO_SAMPLE_LENGTH,
            AUDIO_SAMPLE_RATE,
        )

        self.audio_sample_rate = audio_sample_rate or AUDIO_SAMPLE_RATE
        self.audio_sample_length = audio_sample_length or AUDIO_SAMPLE_LENGTH
        self.audio_transform = audio_transform

    def _video_id(self, sample: Dict) -> str:
        vid = sample["video"]
        if "id" in vid:
            return str(vid["id"])
        # reference jsons carry json_file paths like "x/y/<id>.json"
        return os.path.splitext(os.path.basename(vid.get("json_file", vid.get("video_file", "")) ))[0]

    def process(self, sample, rng):
        frames = np.load(os.path.join(self.frames_dir, f"{self._video_id(sample)}.npy"))
        span = (self.sequence_length - 1) * self.sample_every_n_frames
        if self.fixed_start_idx or len(frames) - span - 1 <= 0:
            start = 0
        else:
            start = rng.randint(0, len(frames) - span)
        idx = start + np.arange(self.sequence_length) * self.sample_every_n_frames
        video = frames[idx].astype(np.float32)
        if video.max() > 1.5:
            video = video / 255.0
        out = {"video": video}

        if self.get_audio:
            from multimodal_tpu.examples.mugen.audio_utils import load_audio

            vid = self._video_id(sample)
            audio_path = None
            for ext in (".wav", ".npy"):
                cand = os.path.join(self.audio_dir, f"{vid}{ext}")
                if os.path.exists(cand):
                    audio_path = cand
                    break
            if audio_path is None:
                raise FileNotFoundError(
                    f"no audio for video {vid} under {self.audio_dir}"
                )
            audio = load_audio(
                audio_path, sr=self.audio_sample_rate,
                duration=self.audio_sample_length,
            )
            if self.audio_transform is not None:
                audio = self.audio_transform(audio)
            out["audio"] = np.asarray(audio, np.float32)

        annotations = sample.get("annotations") or []
        if annotations:
            j = rng.randint(len(annotations)) if self.random_text else 0
            text = annotations[j]["text"]
            if self.text_transform is not None:
                ids = np.asarray(self.text_transform([text]))[0]
                padded = np.zeros((self.text_len,), np.int32)
                n = min(len(ids), self.text_len)
                padded[:n] = ids[:n]
                out["text"] = padded
        return out
