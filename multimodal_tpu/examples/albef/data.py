"""ALBEF data layer: retrieval + VQA datasets.

Parity surface: reference ``examples/albef/data/`` —
``RetrievalTrainingDataset`` (json annotations {image, caption, image_id} ->
(image, caption ids, int idx) with string image_ids densely re-indexed),
``ImageToTextRetrievalDataset`` / ``TextToImageRetrievalDataset`` (the eval
corpora + gt maps for the Recall@k protocol), and ``VQADataset``
(question + de-duplicated answers with occurrence weights; vqa ``0.5``-weight
vg samples). TPU-native shape: answers are padded to a static ``max_answers``
per sample so the weighted-answer decoder loss never recompiles.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_tpu.data.datamodules import DataModule, _to_image


def _load_ann(ann_file) -> List[dict]:
    files = [ann_file] if isinstance(ann_file, str) else list(ann_file)
    ann: List[dict] = []
    for f in files:
        with open(f) as fh:
            ann += json.load(fh)
    return ann


class RetrievalTrainingDataModule(DataModule):
    """{image, text, text_atts, idx} batches for the momentum/queue ITC+ITM
    train step (``albef_retrieval_train_step``)."""

    def __init__(
        self,
        ann_file,
        image_root: str,
        image_transform: Callable,
        text_transform: Callable[[Sequence[str]], np.ndarray],
        text_len: int = 30,
        **kwargs,
    ):
        ann = _load_ann(ann_file)
        super().__init__(ann, **kwargs)
        self.image_root = image_root
        self.image_transform = image_transform
        self.text_transform = text_transform
        self.text_len = text_len
        # densely re-index string image ids (reference retrieval_dataset.py:48-53)
        self.idx: Dict[str, int] = {}
        for a in ann:
            if a["image_id"] not in self.idx:
                self.idx[a["image_id"]] = len(self.idx)

    def _text(self, caption: str) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.asarray(self.text_transform([caption]))[0][: self.text_len]
        text = np.zeros((self.text_len,), np.int32)
        text[: len(ids)] = ids
        return text, (text != 0)

    def process(self, sample, rng):
        image = self.image_transform(
            _to_image(os.path.join(self.image_root, sample["image"]))
        )
        text, atts = self._text(sample["caption"])
        return {
            "image": np.asarray(image),
            "text": text,
            "text_atts": atts,
            "idx": np.asarray(self.idx[sample["image_id"]], np.int32),
        }


def retrieval_eval_data(
    ann_file,
    image_root: str,
) -> Dict[str, object]:
    """Eval corpora for the Recall@k protocol: unique image paths, the flat
    caption list, and the image<->text ground-truth maps
    (reference ImageToTextRetrievalDataset / TextToImageRetrievalDataset)."""
    ann = _load_ann(ann_file)
    images, texts = [], []
    image_to_text: Dict[int, List[int]] = {}
    text_to_image: List[int] = []
    for image_id, a in enumerate(ann):
        images.append(os.path.join(image_root, a["image"]))
        captions = a["caption"] if isinstance(a["caption"], list) else [a["caption"]]
        ids = list(range(len(texts), len(texts) + len(captions)))
        image_to_text[image_id] = ids
        texts.extend(captions)
        text_to_image.extend([image_id] * len(captions))
    return {
        "images": images,
        "texts": texts,
        "image_to_text": image_to_text,
        "text_to_image": text_to_image,
    }


class VQADataModule(DataModule):
    """Train: {image, question, question_atts, answers (A, L), answer_atts,
    answer_weights (A,)} with per-question answer de-dup + occurrence weights
    (vg samples get the constant 0.5); test: {image, question, question_atts,
    question_id}. Reference ``vqa_dataset.py:74-117``."""

    def __init__(
        self,
        ann_file,
        vqa_root: str,
        vg_root: str,
        image_transform: Callable,
        question_transform: Callable[[Sequence[str]], np.ndarray],
        answer_transform: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        split: str = "train",
        answer_list: Optional[str] = None,
        max_answers: int = 10,
        question_len: int = 30,
        answer_len: int = 10,
        **kwargs,
    ):
        super().__init__(_load_ann(ann_file), **kwargs)
        self.vqa_root = vqa_root
        self.vg_root = vg_root
        self.image_transform = image_transform
        self.question_transform = question_transform
        self.answer_transform = answer_transform or question_transform
        self.split = split
        self.max_answers = max_answers
        self.question_len = question_len
        self.answer_len = answer_len
        self.answer_list = None
        if split == "test":
            if answer_list is None:
                raise ValueError("test split requires answer_list")
            with open(answer_list) as f:
                self.answer_list = json.load(f)

    def _pad(self, ids: np.ndarray, length: int) -> np.ndarray:
        out = np.zeros((length,), np.int32)
        ids = np.asarray(ids)[:length]
        out[: len(ids)] = ids
        return out

    def process(self, sample, rng):
        root = self.vqa_root if sample.get("dataset", "vqa") == "vqa" else self.vg_root
        image = self.image_transform(_to_image(os.path.join(root, sample["image"])))
        question = self._pad(
            np.asarray(self.question_transform([sample["question"]]))[0],
            self.question_len,
        )
        out = {
            "image": np.asarray(image),
            "question": question,
            "question_atts": question != 0,
        }
        if self.split == "test":
            out["question_id"] = np.asarray(sample["question_id"], np.int32)
            return out

        if sample.get("dataset", "vqa") == "vqa":
            weights: Dict[str, float] = {}
            for answer in sample["answer"]:
                weights[answer] = weights.get(answer, 0.0) + 1 / len(sample["answer"])
            answers = list(weights.keys())
            answer_weights = list(weights.values())
        else:  # visual genome: single answer, constant 0.5 weight
            answers = [sample["answer"]]
            answer_weights = [0.5]

        a_ids = np.asarray(self.answer_transform(answers[: self.max_answers]))
        answer_mat = np.zeros((self.max_answers, self.answer_len), np.int32)
        w = np.zeros((self.max_answers,), np.float32)
        for i in range(min(len(answers), self.max_answers)):
            answer_mat[i] = self._pad(a_ids[i], self.answer_len)
            w[i] = answer_weights[i]
        out["answers"] = answer_mat
        out["answer_atts"] = answer_mat != 0
        out["answer_weights"] = w
        return out
