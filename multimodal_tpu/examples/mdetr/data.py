"""MDETR data layer: positive-map construction + datamodule.

Parity surface: reference ``examples/mdetr/data/`` — ``create_positive_map``
(transforms.py:333, box -> token-bin soft alignment) and the collate that
pads ragged boxes/maps into a batch (dataset.py:184-200). TPU-native shape:
everything is padded to static (max_boxes, num_bins) on the host so the
jitted loss never recompiles; ragged images go through ``pad_images`` /
``pad_text`` from the model module.

The tokenizer is supplied as ``tokenize_with_offsets(text) -> (ids, offsets)``
where offsets are per-token (char_start, char_end) — offset-aware HF
tokenizers plug in directly; a whitespace+hash fallback ships for tests and
zero-asset runs.
"""

from __future__ import annotations

import zlib
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_tpu.data.datamodules import DataModule, _to_image
from multimodal_tpu.models.mdetr.model import pad_images, pad_text


def whitespace_tokenize_with_offsets(
    text: str, vocab_size: int = 30522, base: int = 1000
) -> Tuple[List[int], List[Tuple[int, int]]]:
    """Deterministic word-level fallback tokenizer with char offsets."""
    ids, offsets = [], []
    pos = 0
    for word in text.split():
        start = text.index(word, pos)
        end = start + len(word)
        ids.append(base + zlib.crc32(word.lower().encode()) % (vocab_size - base))
        offsets.append((start, end))
        pos = end
    return ids, offsets


def create_positive_map(
    offsets: Sequence[Tuple[int, int]],
    tokens_positive: Sequence[Sequence[Tuple[int, int]]],
    num_bins: int = 256,
) -> np.ndarray:
    """Box -> token-bin soft alignment (reference transforms.py:333).

    ``positive_map[i, t] = 1`` iff box i's char span overlaps token t's char
    span; rows are normalized to sum to 1 (the soft-token target
    distribution). ``offsets`` are per-token (char_start, char_end).
    """
    positive_map = np.zeros((len(tokens_positive), num_bins), np.float32)
    for j, spans in enumerate(tokens_positive):
        for beg, end in spans:
            for t, (ts, te) in enumerate(offsets):
                if t >= num_bins:
                    break
                if ts < end and te > beg:  # char-span overlap
                    positive_map[j, t] = 1.0
    return positive_map / (positive_map.sum(-1, keepdims=True) + 1e-6)


class MDETRDataModule(DataModule):
    """Samples {image, text, boxes (cxcywh normalized), tokens_positive}
    -> the static padded batch format consumed by ``mdetr_loss`` and the VQA
    fine-tune recipe: images/image_mask, text/text_attention_mask,
    positive_map (b, max_boxes, num_bins), target_boxes, valid (+ answers /
    answer_type_mask passed through when present)."""

    def __init__(
        self,
        dataset,
        tokenize_with_offsets: Callable = whitespace_tokenize_with_offsets,
        max_boxes: int = 16,
        num_bins: int = 256,
        text_len: int = 64,
        image_size: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(dataset, **kwargs)
        self.tokenize_with_offsets = tokenize_with_offsets
        self.max_boxes = max_boxes
        self.num_bins = num_bins
        self.text_len = text_len
        self.image_size = image_size

    def process(self, sample: Dict[str, Any], rng) -> Dict[str, np.ndarray]:
        img = _to_image(sample["image"])
        if self.image_size is not None and hasattr(img, "resize"):
            img = img.resize((self.image_size, self.image_size))
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0

        ids, offsets = self.tokenize_with_offsets(sample["text"])
        ids = ids[: self.text_len]
        text = np.zeros((self.text_len,), np.int32)
        text[: len(ids)] = ids
        text_mask = np.zeros((self.text_len,), bool)
        text_mask[: len(ids)] = True

        boxes = np.asarray(sample["boxes"], np.float32).reshape(-1, 4)
        n = min(len(boxes), self.max_boxes)
        target_boxes = np.zeros((self.max_boxes, 4), np.float32)
        target_boxes[:n] = boxes[:n]
        valid = np.zeros((self.max_boxes,), bool)
        valid[:n] = True

        pm = create_positive_map(
            offsets, sample["tokens_positive"][:n], num_bins=self.num_bins
        )
        positive_map = np.zeros((self.max_boxes, self.num_bins), np.float32)
        positive_map[:n] = pm

        out = {
            "image": img,
            "text": text,
            "text_attention_mask": text_mask,
            "positive_map": positive_map,
            "target_boxes": target_boxes,
            "valid": valid,
        }
        for key in ("answers", "answer_type_mask"):
            if key in sample:
                out[key] = sample[key]
        return out

    def collate(self, samples):
        # ragged -> padded image batch with padding mask (model format);
        # everything else is already static-shape and stacks
        images, image_mask = pad_images([s.pop("image") for s in samples])
        rest: Dict[str, Any] = {}
        for key, v0 in samples[0].items():
            if isinstance(v0, dict):  # answers / answer_type_mask
                rest[key] = {
                    k: np.stack([np.asarray(s[key][k]) for s in samples]) for k in v0
                }
            else:
                rest[key] = np.stack([np.asarray(s[key]) for s in samples])
        return {"images": images, "image_mask": image_mask, **rest}
