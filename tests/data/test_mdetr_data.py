"""MDETR data layer: positive-map construction + datamodule batch format
(reference examples/mdetr/data/transforms.py:333, dataset.py:184-200)."""

import numpy as np

from multimodal_tpu.data.datasets import ListDataset
from multimodal_tpu.examples.mdetr.data import (
    MDETRDataModule,
    create_positive_map,
    whitespace_tokenize_with_offsets,
)


def test_whitespace_offsets():
    ids, offsets = whitespace_tokenize_with_offsets("a red cat sits")
    assert len(ids) == len(offsets) == 4
    assert offsets[1] == (2, 5)  # "red"
    # deterministic
    assert ids == whitespace_tokenize_with_offsets("a red cat sits")[0]


def test_create_positive_map_overlap_and_normalization():
    text = "a red cat next to the blue dog"
    _, offsets = whitespace_tokenize_with_offsets(text)
    # box 0 -> "red cat" (chars 2..9), box 1 -> "blue dog" (chars 22..30)
    pm = create_positive_map(
        offsets,
        [[(2, 9)], [(text.index("blue"), len(text))]],
        num_bins=16,
    )
    assert pm.shape == (2, 16)
    # box 0 covers tokens 1,2 with equal mass; nothing else
    np.testing.assert_allclose(pm[0, 1:3], [0.5, 0.5], atol=1e-5)
    assert pm[0, 3:].sum() == 0 and pm[0, 0] == 0
    # box 1 covers the last two tokens
    assert pm[1, 6] > 0 and pm[1, 7] > 0
    np.testing.assert_allclose(pm.sum(-1), [1.0, 1.0], atol=1e-4)


def test_mdetr_datamodule_batch_format():
    rng = np.random.RandomState(0)
    samples = []
    for i in range(6):
        h, w = rng.randint(24, 33, 2)
        text = f"the object number {i} beside another thing"
        samples.append(
            {
                "image": rng.rand(h, w, 3).astype(np.float32),
                "text": text,
                "boxes": [[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1]],
                "tokens_positive": [[(0, 10)], [(text.index("another"), len(text))]],
                "answers": {"answer_type": np.int32(i % 5)},
                "answer_type_mask": {"answer_type": np.bool_(True)},
            }
        )
    dm = MDETRDataModule(
        ListDataset(samples), max_boxes=4, num_bins=12, text_len=10,
        batch_size=3, prefetch=0, shuffle=False,
    )
    batch = next(iter(dm))
    assert batch["images"].shape[0] == 3 and batch["images"].shape[-1] == 3
    assert batch["image_mask"].shape == batch["images"].shape[:3]
    assert batch["text"].shape == (3, 10)
    assert batch["positive_map"].shape == (3, 4, 12)
    assert batch["target_boxes"].shape == (3, 4, 4)
    assert batch["valid"].tolist() == [[True, True, False, False]] * 3
    assert batch["answers"]["answer_type"].shape == (3,)
    # rows for real boxes are normalized distributions; padded rows are zero
    sums = batch["positive_map"].sum(-1)
    np.testing.assert_allclose(sums[:, :2], 1.0, atol=1e-3)
    np.testing.assert_allclose(sums[:, 2:], 0.0, atol=1e-6)
