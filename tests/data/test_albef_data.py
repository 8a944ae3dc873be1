"""ALBEF data layer: retrieval/VQA datasets (reference examples/albef/data/)."""

import json

import numpy as np

from multimodal_tpu.examples.albef.data import (
    RetrievalTrainingDataModule,
    VQADataModule,
    retrieval_eval_data,
)


def _toy_tokenize(texts, length=6):
    return np.asarray(
        [[1] + [10 + ord(c) % 50 for c in t.replace(" ", "")[: length - 1]]
         for t in texts]
    )


def _images(tmp_path, n):
    from PIL import Image

    rng = np.random.RandomState(0)
    (tmp_path / "imgs").mkdir(exist_ok=True)
    paths = []
    for i in range(n):
        p = f"imgs/{i}.png"
        Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).save(tmp_path / p)
        paths.append(p)
    return paths


def test_retrieval_training_datamodule(tmp_path):
    paths = _images(tmp_path, 3)
    ann = [
        {"image": paths[0], "caption": "a cat", "image_id": "coco_7"},
        {"image": paths[1], "caption": "a dog", "image_id": "coco_9"},
        {"image": paths[0], "caption": "feline pet", "image_id": "coco_7"},
        {"image": paths[2], "caption": "a car", "image_id": "coco_11"},
    ]
    ann_file = tmp_path / "train.json"
    ann_file.write_text(json.dumps(ann))
    dm = RetrievalTrainingDataModule(
        str(ann_file), str(tmp_path), image_transform=lambda im: np.asarray(im),
        text_transform=_toy_tokenize, text_len=6, batch_size=4, prefetch=0,
        shuffle=False,
    )
    batch = next(iter(dm))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["text"].shape == (4, 6)
    # duplicate image_id gets the same dense idx (queue-target semantics)
    assert batch["idx"][0] == batch["idx"][2]
    assert len(set(batch["idx"].tolist())) == 3


def test_retrieval_eval_data(tmp_path):
    paths = _images(tmp_path, 2)
    ann = [
        {"image": paths[0], "caption": ["a cat", "feline"], "image_id": "a"},
        {"image": paths[1], "caption": ["a dog"], "image_id": "b"},
    ]
    ann_file = tmp_path / "test.json"
    ann_file.write_text(json.dumps(ann))
    data = retrieval_eval_data(str(ann_file), str(tmp_path))
    assert len(data["images"]) == 2 and len(data["texts"]) == 3
    assert data["image_to_text"] == {0: [0, 1], 1: [2]}
    assert data["text_to_image"] == [0, 0, 1]


def test_vqa_datamodule_train_and_test(tmp_path):
    paths = _images(tmp_path, 2)
    ann = [
        {"dataset": "vqa", "image": paths[0], "question": "what is it",
         "answer": ["cat", "cat", "dog"], "question_id": 5},
        {"dataset": "vg", "image": paths[1], "question": "how many",
         "answer": "two", "question_id": 6},
    ]
    ann_file = tmp_path / "vqa.json"
    ann_file.write_text(json.dumps(ann))
    common = dict(
        vqa_root=str(tmp_path), vg_root=str(tmp_path),
        image_transform=lambda im: np.asarray(im),
        question_transform=_toy_tokenize, max_answers=4, question_len=8,
        answer_len=6, batch_size=2, prefetch=0, shuffle=False,
    )
    dm = VQADataModule(str(ann_file), split="train", **common)
    batch = next(iter(dm))
    assert batch["answers"].shape == (2, 4, 6)
    assert batch["answer_weights"].shape == (2, 4)
    # vqa sample: dedup'd answers with occurrence weights 2/3, 1/3
    np.testing.assert_allclose(
        sorted(batch["answer_weights"][0][:2], reverse=True), [2 / 3, 1 / 3],
        atol=1e-6,
    )
    assert batch["answer_weights"][0][2:].sum() == 0
    # vg sample: one answer, constant 0.5
    np.testing.assert_allclose(batch["answer_weights"][1][:1], [0.5])

    answers_path = tmp_path / "answers.json"
    answers_path.write_text(json.dumps(["cat", "dog", "two"]))
    dm_test = VQADataModule(
        str(ann_file), split="test", answer_list=str(answers_path), **common
    )
    batch = next(dm_test.eval_batches())
    assert batch["question_id"].tolist() == [5, 6]
    assert dm_test.answer_list == ["cat", "dog", "two"]
