"""Omnivore data layer: image / video / RGB-D datamodules + multi-task mixing.

Parity surface: reference ``examples/omnivore/data/`` — the SUN RGB-D
dataset's depth->disparity conversion (``datasets.py:113-129``:
``disparity = baseline * focal_length / (depth_mm / 1000)`` from the
sensor intrinsics, stacked as a 4th channel) and ``get_omnivore_data_loader``
(``data_builder.py:247``: one loader per modality cycled with per-dataset
sampling factors). Here the mixing rides the existing deterministic
``MultiDataLoader`` (no collectives), and each modality is a ``DataModule``
yielding static-shape batches keyed for the Omnivore head dispatch:
image (b,h,w,3) / video (b,t,h,w,3) / rgbd (b,h,w,4) + labels.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from multimodal_tpu.data.datamodules import DataModule, _to_image
from multimodal_tpu.training.multidata import MultiDataLoader, make_weighted_sampling


def depth_to_disparity(
    depth: np.ndarray, baseline: float, focal_length: float
) -> np.ndarray:
    """SUN RGB-D depth (millimeters) -> disparity (reference datasets.py:128)."""
    depth_m = np.maximum(depth.astype(np.float32) / 1000.0, 1e-6)
    return baseline * focal_length / depth_m


class SunRGBDDataModule(DataModule):
    """Samples {image: path/array, depth: path/array (mm), label,
    baseline?, focal_length?} -> {rgbd (h, w, 4), labels} batches."""

    def __init__(
        self,
        dataset,
        image_transform: Optional[Callable] = None,
        default_baseline: float = 0.075,
        default_focal_length: float = 518.857901,
        disparity_scale: float = 1.0 / 512.0,
        **kwargs,
    ):
        super().__init__(dataset, **kwargs)
        self.image_transform = image_transform
        self.default_baseline = default_baseline
        self.default_focal_length = default_focal_length
        self.disparity_scale = disparity_scale

    def process(self, sample, rng):
        rgb = np.asarray(_to_image(sample["image"]), np.float32)
        if rgb.max() > 1.5:
            rgb = rgb / 255.0
        depth = sample["depth"]
        if isinstance(depth, str):
            depth = np.asarray(_to_image(depth), np.float32)
        disparity = depth_to_disparity(
            np.asarray(depth, np.float32),
            float(sample.get("baseline", self.default_baseline)),
            float(sample.get("focal_length", self.default_focal_length)),
        ) * self.disparity_scale
        rgbd = np.concatenate([rgb, disparity[..., None]], axis=-1)
        if self.image_transform is not None:
            rgbd = self.image_transform(rgbd)
        out = {"rgbd": np.asarray(rgbd, np.float32)}
        if "label" in sample:
            out["labels"] = np.asarray(sample["label"], np.int32)
        return out


class VideoClipDataModule(DataModule):
    """Samples {video: (T,H,W,3) array or .npy path, label} -> {video
    (S,H,W,3), labels}; every-n frame sampling with seeded random start
    (the Kinetics clip-sampler analog)."""

    def __init__(
        self,
        dataset,
        sequence_length: int = 8,
        sample_every_n_frames: int = 2,
        random_start: bool = True,
        **kwargs,
    ):
        super().__init__(dataset, **kwargs)
        self.sequence_length = sequence_length
        self.sample_every_n_frames = sample_every_n_frames
        self.random_start = random_start

    def process(self, sample, rng):
        frames = sample["video"]
        if isinstance(frames, str):
            frames = np.load(frames)
        span = (self.sequence_length - 1) * self.sample_every_n_frames
        high = max(len(frames) - span, 1)
        start = rng.randint(0, high) if self.random_start else 0
        idx = np.minimum(
            start + np.arange(self.sequence_length) * self.sample_every_n_frames,
            len(frames) - 1,
        )
        video = frames[idx].astype(np.float32)
        if video.max() > 1.5:
            video = video / 255.0
        out = {"video": video}
        if "label" in sample:
            out["labels"] = np.asarray(sample["label"], np.int32)
        return out


def build_omnivore_loader(
    datamodules: Dict[str, DataModule],
    sampling_factors: Optional[Sequence[float]] = None,
    seed: int = 0,
) -> MultiDataLoader:
    """Per-dataset round-robin with sampling factors
    (reference data_builder.py:247-281). Zero-factor modalities are dropped,
    like the reference."""
    names = [n for i, n in enumerate(datamodules) if
             sampling_factors is None or sampling_factors[i] > 0]
    loaders = {n: datamodules[n].train_batches() for n in names}
    if sampling_factors is not None:
        factors = [f for f in sampling_factors if f > 0]
        return MultiDataLoader(
            loaders, sampling_fn=make_weighted_sampling(factors), seed=seed
        )
    return MultiDataLoader(loaders, seed=seed)
