"""Real-data layer: datasets loader, datamodules, ImageNet zero-shot data."""

import json
import os

import numpy as np
import pytest

from multimodal_tpu.data.datamodules import ImageDataModule, MLMDataModule, VLDataModule
from multimodal_tpu.data.datasets import ListDataset, load_dataset
from multimodal_tpu.data.imagenet_zeroshot import (
    imagenet_classnames,
    imagenet_templates,
    imagenet_zero_shot_eval,
)
from multimodal_tpu.training.mlm_collator import MLMCollator


def _toy_tokenize(texts, length=12):
    out = np.zeros((len(texts), length), dtype=np.int32)
    for i, t in enumerate(texts):
        ids = [101] + [10 + (ord(c) % 90) for c in t][: length - 2] + [102]
        out[i, : len(ids)] = ids
    return out


def _vl_dataset(n=16, hw=32):
    rng = np.random.RandomState(0)
    return ListDataset(
        [
            {
                "image": rng.randint(0, 256, (hw, hw, 3), dtype=np.uint8),
                "text": f"a photo of item number {i}",
            }
            for i in range(n)
        ]
    )


def test_vl_datamodule_shapes_and_determinism():
    ds = _vl_dataset()
    collator = MLMCollator(vocab_size=100, mask_token_id=3, special_token_ids=(0, 101, 102))

    def make():
        dm = VLDataModule(
            ds,
            image_transform=lambda im: np.asarray(im),
            text_transform=_toy_tokenize,
            mlm_collator=collator,
            itm_probability=0.5,
            batch_size=4,
            seed=7,
            prefetch=0,
        )
        it = dm.train_batches()
        return [next(it) for _ in range(6)]  # crosses an epoch boundary (16/4=4)

    b1, b2 = make(), make()
    for x, y in zip(b1, b2):
        assert sorted(x) == sorted(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
    batch = b1[0]
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["text"].shape == (4, 12)
    assert batch["text_masked"].shape == (4, 12)
    assert batch["mlm_labels"].shape == (4, 12)
    assert batch["itm_labels"].shape == (4,)
    # over several batches both positive and negative ITM pairs appear
    itm = np.concatenate([b["itm_labels"] for b in b1])
    assert set(np.unique(itm)) == {0, 1}
    # negative pairs got a different caption: spot-check masking correctness
    labels = batch["mlm_labels"]
    masked = labels != -100
    np.testing.assert_array_equal(labels[masked], batch["text"][masked])


def test_vl_datamodule_prefetch_matches_sync():
    ds = _vl_dataset()
    kwargs = dict(
        image_transform=lambda im: np.asarray(im),
        text_transform=_toy_tokenize,
        itm_probability=0.0,
        batch_size=4,
        seed=3,
    )
    sync_it = VLDataModule(ds, prefetch=0, **kwargs).train_batches()
    pre_it = VLDataModule(ds, prefetch=2, **kwargs).train_batches()
    for _ in range(5):
        a, b = next(sync_it), next(pre_it)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_mlm_datamodule():
    ds = ListDataset([{"text": f"sentence number {i} with words"} for i in range(8)])
    collator = MLMCollator(vocab_size=100, mask_token_id=3, special_token_ids=(0, 101, 102))
    dm = MLMDataModule(ds, _toy_tokenize, collator, batch_size=4, prefetch=0)
    batch = next(iter(dm))
    assert set(batch) == {"text", "text_masked", "mlm_labels"}
    assert batch["text"].shape == (4, 12)


def test_image_datamodule_from_imagefolder(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for cls in ("cat", "dog"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    ds = load_dataset(str(tmp_path), split="train")
    assert len(ds) == 6
    dm = ImageDataModule(ds, batch_size=2, shuffle=False, prefetch=0)
    batch = next(dm.eval_batches())
    assert batch["image"].shape == (2, 24, 24, 3)
    assert batch["labels"].tolist() == [0, 0]  # sorted classes: cat=0
    # classnames recoverable for zero-shot
    assert ds[0]["classname"] == "cat"


def test_load_dataset_jsonl(tmp_path):
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"text": f"line {i}", "label": i}) + "\n")
    ds = load_dataset(str(p))
    assert len(ds) == 5 and ds[2]["text"] == "line 2"


def test_load_dataset_hf_arrow(tmp_path):
    hf_datasets = pytest.importorskip("datasets")
    ds = hf_datasets.Dataset.from_dict(
        {"text": [f"t{i}" for i in range(4)], "label": list(range(4))}
    )
    ds.save_to_disk(str(tmp_path / "arrow"))
    loaded = load_dataset(str(tmp_path / "arrow"))
    assert len(loaded) == 4 and loaded[1]["text"] == "t1"


def test_imagenet_zeroshot_asset():
    names = imagenet_classnames()
    templates = imagenet_templates()
    assert len(names) == 1000
    assert len(templates) == 80
    assert names[0] == "tench" and names[-1] == "toilet paper"
    assert all("{}" in t for t in templates)
    assert "a bad photo of a {}." in templates


def test_imagenet_zero_shot_eval_protocol():
    # fake encoders: class-c images/prompts embed near one-hot(c % d)
    d = 8
    names = ["alpha", "beta", "gamma", "delta"]

    def tokenize(prompts):
        # recover class id from the prompt text
        ids = [[names.index(n) for n in names if n in p][0] for p in prompts]
        return np.asarray(ids)[:, None]

    def encode_text(tokens):
        e = np.eye(d)[tokens[:, 0] % d] + 0.01
        return np.asarray(e, dtype=np.float32)

    def encode_image(images):
        return np.asarray(np.eye(d)[images % d], dtype=np.float32)

    batches = [
        {"image": np.array([0, 1]), "labels": np.array([0, 1])},
        {"image": np.array([2, 3]), "labels": np.array([2, 2])},  # one wrong
    ]
    out = imagenet_zero_shot_eval(
        encode_image, encode_text, tokenize, batches, classnames=names,
        templates=["a photo of a {}.", "art of the {}."],
    )
    assert out["top1"] == 0.75
    assert 0.75 <= out["top5"] <= 1.0


def test_device_prefetch():
    import jax
    import jax.numpy as jnp

    from multimodal_tpu.data.device_prefetch import device_prefetch

    batches = [{"x": np.full((4, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    # with an explicit sharding over the mesh
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    big = [{"x": np.full((8, 2), i, np.float32)} for i in range(2)]
    sharded = list(device_prefetch(iter(big), NamedSharding(mesh, P("dp"))))
    assert sharded[0]["x"].sharding.spec == P("dp")

    # short iterators (fewer batches than depth) still drain fully
    assert len(list(device_prefetch(iter(batches[:1]), depth=4))) == 1


def test_image_datamodule_native_jpeg_staging(tmp_path):
    """jpeg_staging: JPEG paths decode through the native libjpeg kernel to
    fixed uint8 staging arrays ready for the on-device fused pipeline."""
    import io

    from PIL import Image

    from multimodal_tpu.data.datamodules import ImageDataModule

    rng_np = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(300, 400), (640, 480)]):
        arr = (rng_np.rand(h, w, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p, format="JPEG", quality=92)
        paths.append(str(p))
    ds = [{"image": p, "label": i} for i, p in enumerate(paths)]

    dm = ImageDataModule(
        ds, jpeg_staging=(256, 256), batch_size=2, shuffle=False, prefetch=0
    )
    batch = next(iter(dm.eval_batches()))
    assert batch["image"].shape == (2, 256, 256, 3)
    assert batch["image"].dtype == np.uint8
    # raw JPEG bytes work too
    buf = io.BytesIO()
    Image.fromarray((rng_np.rand(64, 64, 3) * 255).astype(np.uint8)).save(
        buf, format="JPEG"
    )
    dm2 = ImageDataModule(
        [{"image": buf.getvalue(), "label": 0}],
        jpeg_staging=(128, 128), batch_size=1, shuffle=False, prefetch=0,
    )
    b2 = next(iter(dm2.eval_batches()))
    assert b2["image"].shape == (1, 128, 128, 3)


def test_train_batches_mid_epoch_resume_exact():
    """train_batches(start_step=k) == dropping the first k batches of
    train_batches(): per-batch rng keyed on (seed, epoch, offset) makes
    mid-epoch checkpoint resume exact, including rng-driven augmentation
    and across epoch boundaries."""
    from multimodal_tpu.data.datamodules import DataModule

    class RngDM(DataModule):
        # rng-consuming process: any drift in rng threading shows up
        def process(self, sample, rng):
            return {
                "i": np.asarray(sample, np.int64),
                "r": rng.rand(3).astype(np.float32),
            }

    def make():
        return RngDM(list(range(20)), batch_size=4, shuffle=True, seed=5,
                     prefetch=0)

    assert make().batches_per_epoch() == 5
    full = make().train_batches()
    ref = [next(full) for _ in range(12)]  # 2.4 epochs
    for k in (0, 3, 5, 7, 11):  # mid-epoch, boundary, second epoch
        resumed = make().train_batches(start_step=k)
        for step in range(k, 12):
            got = next(resumed)
            for key in ("i", "r"):
                np.testing.assert_array_equal(got[key], ref[step][key])
