"""FLAVA image transform (host-side, PIL/numpy).

Parity with reference ``transforms/flava_transform.py`` (map_pixels:24,
ImageMaskingGenerator:31, TwoWayResize:110, TwoWayRandomResizedCrop:152,
FLAVAImageTransform:205): ONE crop resized two ways — 224px bicubic for the
encoder + 112px LANCZOS for the dVAE codebook (mapped through the
logit-Laplace pixel transform) — plus BEiT-style block masking.

The block-masking rejection loop is inherently sequential and runs
host-side in the data pipeline (SURVEY §7 hard-parts #8), never inside jit.
Output arrays are NHWC float32.
"""

from __future__ import annotations

import math
import random as _random
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

IMAGE_PRETRAINING_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_PRETRAINING_STD = (0.26862954, 0.26130258, 0.27577711)
LOGIT_LAPLACE_EPS = 0.1


def map_pixels(x: np.ndarray) -> np.ndarray:
    """Logit-Laplace pixel mapping for the DALL-E dVAE (reference :24)."""
    if not np.issubdtype(x.dtype, np.floating):
        raise ValueError("expected input to have float type")
    return (1 - 2 * LOGIT_LAPLACE_EPS) * x + LOGIT_LAPLACE_EPS


class ImageMaskingGenerator:
    """BEiT block masking: aspect-ratio rectangles until the target count
    (reference :31-108)."""

    def __init__(
        self,
        input_size: Union[Tuple[int, int], int],
        num_masking_patches: int,
        min_num_patches: int = 4,
        max_num_patches: Optional[int] = None,
        min_aspect: float = 0.3,
        max_aspect: Optional[float] = None,
        rng: Optional[_random.Random] = None,
    ) -> None:
        if not isinstance(input_size, tuple):
            input_size = (input_size,) * 2
        self.height, self.width = input_size
        self.num_masking_patches = num_masking_patches
        self.min_num_patches = min_num_patches
        self.max_num_patches = (
            num_masking_patches if max_num_patches is None else max_num_patches
        )
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.rng = rng or _random.Random()

    def _mask(self, mask: np.ndarray, max_mask_patches: int) -> int:
        delta = 0
        for _ in range(10):
            target_area = self.rng.uniform(self.min_num_patches, max_mask_patches)
            aspect = math.exp(self.rng.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect)))
            w = int(round(math.sqrt(target_area / aspect)))
            if w < self.width and h < self.height:
                top = self.rng.randint(0, self.height - h)
                left = self.rng.randint(0, self.width - w)
                region = mask[top : top + h, left : left + w]
                new = h * w - int(region.sum())
                if 0 < new <= max_mask_patches:
                    delta = new
                    region[:] = 1
                if delta > 0:
                    break
        return delta

    def __call__(self) -> np.ndarray:
        mask = np.zeros((self.height, self.width), dtype=np.int64)
        count = 0
        while count < self.num_masking_patches:
            max_patches = min(self.num_masking_patches - count, self.max_num_patches)
            delta = self._mask(mask, max_patches)
            if delta == 0:
                break
            count += delta
        return mask


class FLAVAImageTransform:
    """Two-way resize/crop + normalize + codebook mapping + block mask."""

    def __init__(
        self,
        is_train: bool = True,
        encoder_input_size: int = 224,
        codebook_input_size: int = 112,
        scale: Tuple[float, float] = (0.9, 1.0),
        image_mean: Tuple[float, ...] = IMAGE_PRETRAINING_MEAN,
        image_std: Tuple[float, ...] = IMAGE_PRETRAINING_STD,
        mask_window_size: int = 14,
        mask_num_patches: int = 75,
        mask_max_patches: Optional[int] = None,
        mask_min_patches: int = 16,
        rng: Optional[np.random.RandomState] = None,
    ) -> None:
        self.is_train = is_train
        self.encoder_input_size = encoder_input_size
        self.codebook_input_size = codebook_input_size
        self.scale = scale
        self.mean = np.asarray(image_mean, np.float32)
        self.std = np.asarray(image_std, np.float32)
        self.rng = rng or np.random.RandomState()
        self.masked_position_generator = ImageMaskingGenerator(
            mask_window_size,
            num_masking_patches=mask_num_patches,
            max_num_patches=mask_max_patches,
            min_num_patches=mask_min_patches,
        )

    def _two_way(self, img):
        """One crop, two sizes/interpolations (reference TwoWayRandomResizedCrop)."""
        from PIL import Image

        w, h = img.size
        if self.is_train:
            area = w * h
            for _ in range(10):
                target_area = area * self.rng.uniform(*self.scale)
                aspect = math.exp(self.rng.uniform(math.log(3 / 4), math.log(4 / 3)))
                cw = int(round(math.sqrt(target_area * aspect)))
                ch = int(round(math.sqrt(target_area / aspect)))
                if 0 < cw <= w and 0 < ch <= h:
                    left = self.rng.randint(0, w - cw + 1)
                    top = self.rng.randint(0, h - ch + 1)
                    box = (left, top, left + cw, top + ch)
                    enc = img.resize(
                        (self.encoder_input_size,) * 2, Image.BICUBIC, box=box
                    )
                    code = img.resize(
                        (self.codebook_input_size,) * 2, Image.LANCZOS, box=box
                    )
                    return enc, code
        enc = img.resize((self.encoder_input_size,) * 2, Image.BICUBIC)
        code = enc.resize((self.codebook_input_size,) * 2, Image.LANCZOS)
        return enc, code

    def transform(self, image) -> Dict[str, np.ndarray]:
        if image.mode != "RGB":
            image = image.convert("RGB")
        enc_img, code_img = self._two_way(image)
        enc = np.asarray(enc_img, np.float32) / 255.0
        enc = (enc - self.mean) / self.std
        code = map_pixels(np.asarray(code_img, np.float32) / 255.0)
        return {
            "image": enc,
            "image_for_codebook": code,
            "image_patches_mask": self.masked_position_generator(),
        }

    def __call__(self, images) -> Dict[str, np.ndarray]:
        if not isinstance(images, (list, tuple)):
            images = [images]
        outs = [self.transform(im) for im in images]
        return {k: np.stack([o[k] for o in outs]) for k in outs[0]}
