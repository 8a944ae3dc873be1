"""MUGEN dataset layer (reference examples/mugen/data/mugen_dataset.py):
metadata JSON + pre-rendered clips -> static video/text batches."""

import json

import numpy as np

from multimodal_tpu.examples.mugen.data import MUGENDataModule


def _toy_tokenize(texts, length=8):
    return np.asarray(
        [[1] + [10 + ord(c) % 50 for c in t[: length - 1]] for t in texts]
    )


def _write_dataset(tmp_path, n=5, frames=40):
    rng = np.random.RandomState(0)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    data = []
    for i in range(n):
        num = frames if i else 3  # first clip too short -> filtered
        np.save(frames_dir / f"vid{i}.npy",
                rng.randint(0, 256, (num, 8, 8, 3), dtype=np.uint8))
        data.append({
            "video": {"id": f"vid{i}", "num_frames": num},
            "annotations": [{"text": f"mugen jumps over gap {i}"}],
        })
    with open(tmp_path / "train.json", "w") as f:
        json.dump({"metadata": {"version": "test"}, "data": data}, f)
    return str(tmp_path), str(frames_dir)


def test_mugen_datamodule(tmp_path):
    data_path, frames_dir = _write_dataset(tmp_path)
    dm = MUGENDataModule(
        data_path, frames_dir, text_transform=_toy_tokenize,
        sequence_length=4, sample_every_n_frames=3, text_len=8,
        batch_size=2, prefetch=0, shuffle=False,
    )
    # too-short clip filtered (reference mugen_dataset.py:92-97)
    assert len(dm.dataset) == 4
    batch = next(iter(dm))
    assert batch["video"].shape == (2, 4, 8, 8, 3)
    assert batch["video"].dtype == np.float32
    assert 0.0 <= batch["video"].min() and batch["video"].max() <= 1.0
    assert batch["text"].shape == (2, 8)

    # random start sampling stays in range and is deterministic per seed
    dm2 = MUGENDataModule(
        data_path, frames_dir, text_transform=_toy_tokenize,
        sequence_length=4, sample_every_n_frames=3, fixed_start_idx=False,
        text_len=8, batch_size=2, prefetch=0, seed=3,
    )
    a = next(iter(dm2))["video"]
    b = next(iter(MUGENDataModule(
        data_path, frames_dir, text_transform=_toy_tokenize,
        sequence_length=4, sample_every_n_frames=3, fixed_start_idx=False,
        text_len=8, batch_size=2, prefetch=0, seed=3,
    )))["video"]
    np.testing.assert_array_equal(a, b)
