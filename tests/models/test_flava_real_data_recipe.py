"""End-to-end FLAVA pretraining on a real on-disk dataset through the
real-data layer (reference: examples/flava/data/datamodules.py feeding
examples/flava/native/train.py). The dataset is a jsonl of {image: png path,
text: caption}; the VLDataModule applies the two-way FLAVA image transform,
tokenization, MLM masking, and ITM pairing; Trainer.fit runs the full
6-loss objective including the dVAE MIM path."""

import json
import os

import numpy as np
import pytest

from multimodal_tpu.examples.flava.pretrain import (
    DEFAULTS,
    build_trainer_and_state,
    real_batches,
)
from multimodal_tpu.utils.config import build_config

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "..",
    "multimodal_tpu", "examples", "flava", "configs", "debug.yaml",
)


def _write_dataset(tmp_path, n=12):
    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    path = tmp_path / "train.jsonl"
    with open(path, "w") as f:
        for i in range(n):
            p = img_dir / f"{i}.png"
            Image.fromarray(
                rng.randint(0, 256, (48, 40, 3), dtype=np.uint8)
            ).save(p)
            f.write(json.dumps({"image": str(p), "text": f"a photo of thing {i}"}) + "\n")
    return str(path)


@pytest.mark.slow
def test_flava_zero_shot_eval_wiring(tmp_path):
    """build_zero_shot_eval runs the full protocol (classnames x templates
    classifier + top-k over an eval stream) against a tiny image folder."""
    from PIL import Image

    from multimodal_tpu.examples.flava.pretrain import (
        _build_model,
        build_zero_shot_eval,
    )

    rng = np.random.RandomState(0)
    for cls in ("apple", "banana"):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")

    cfg = build_config(
        CONFIG,
        overrides=[
            f"data.imagenet_path={tmp_path}",
            "data.eval_batch_size=4",
            "data.zero_shot_templates=2",
        ],
        defaults=DEFAULTS,
    )
    model = _build_model(cfg)
    eval_fn = build_zero_shot_eval(cfg, model)

    import jax
    import jax.numpy as jnp

    s = cfg["model"]["image_size"]
    n = s // cfg["model"]["patch_size"]
    params = model.init(
        jax.random.PRNGKey(0),
        image=jnp.zeros((1, s, s, 3)),
        text=jnp.zeros((1, cfg["data"]["text_len"]), jnp.int32),
        text_masked=jnp.zeros((1, cfg["data"]["text_len"]), jnp.int32),
        itm_labels=jnp.zeros((1,), jnp.int32),
        mlm_labels=jnp.zeros((1, cfg["data"]["text_len"]), jnp.int32),
        image_for_codebook=jnp.zeros((1, n * 8, n * 8, 3)),
        image_patches_mask=jnp.zeros((1, n, n), jnp.int32),
    )
    metrics = eval_fn(params)
    assert set(metrics) == {"top1", "top5"}
    assert 0.0 <= metrics["top1"] <= 1.0
    assert metrics["top5"] == 1.0  # only 2 classes -> top5 always right


@pytest.mark.slow
def test_flava_pretrain_on_real_dataset(tmp_path):
    data_path = _write_dataset(tmp_path)
    cfg = build_config(
        CONFIG,
        overrides=[
            "train.steps=2",
            f"train.log_dir={tmp_path}",
            f"data.path={data_path}",
            "data.batch_size=8",
        ],
        defaults=DEFAULTS,
    )
    batches = real_batches(cfg)
    first = next(iter(batches))
    s = cfg["model"]["image_size"]
    n = s // cfg["model"]["patch_size"]
    assert first["image"].shape == (8, s, s, 3)
    assert first["image_for_codebook"].shape == (8, n * 8, n * 8, 3)
    assert first["image_patches_mask"].shape == (8, n, n)
    assert first["text"].shape == (8, cfg["data"]["text_len"])
    assert set(first) >= {"text_masked", "mlm_labels", "itm_labels"}

    trainer, state = build_trainer_and_state(cfg)
    state = trainer.fit(state, real_batches(cfg), num_steps=2)
    assert int(state["step"]) == 2
    records = [
        json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(records) == 2
    # the dVAE codebook path is active on real data: the MMM-image loss
    # (codebook-label cross-entropy over masked patches) is present & finite
    assert "mmm_image_loss" in records[0], records[0].keys()
    assert np.isfinite(records[0]["mmm_image_loss"])
    assert np.isfinite(records[0]["loss"])
    assert records[0].get("nonfinite_skipped", 0.0) == 0.0


def _write_tar_dataset(tmp_path, n_shards=2, per_shard=8):
    import io
    import tarfile

    from PIL import Image

    rng = np.random.RandomState(0)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for s in range(n_shards):
        with tarfile.open(shard_dir / f"train-{s:04d}.tar", "w") as tf:
            for i in range(per_shard):
                k = f"{s:03d}{i:03d}"
                buf = io.BytesIO()
                Image.fromarray(
                    rng.randint(0, 256, (48, 40, 3), dtype=np.uint8)
                ).save(buf, format="PNG")
                for ext, blob in (
                    ("png", buf.getvalue()),
                    ("txt", f"a photo of thing {k}".encode()),
                ):
                    info = tarfile.TarInfo(f"{k}.{ext}")
                    info.size = len(blob)
                    tf.addfile(info, io.BytesIO(blob))
    return str(shard_dir)


@pytest.mark.slow
def test_flava_pretrain_on_webdataset_stream(tmp_path):
    """The same recipe trains straight from webdataset tar shards
    (data.path=dir-of-.tar -> StreamingVLDataModule with in-batch ITM
    negatives), exercising the pod-scale streaming input end to end."""
    shard_dir = _write_tar_dataset(tmp_path)
    cfg = build_config(
        CONFIG,
        overrides=[
            "train.steps=2",
            f"train.log_dir={tmp_path}",
            f"data.path={shard_dir}",
            "data.batch_size=8",
            "data.shuffle_buffer=8",
        ],
        defaults=DEFAULTS,
    )
    first = next(iter(real_batches(cfg)))
    s = cfg["model"]["image_size"]
    assert first["image"].shape == (8, s, s, 3)
    assert set(first) >= {"text", "text_masked", "mlm_labels", "itm_labels"}

    trainer, state = build_trainer_and_state(cfg)
    state = trainer.fit(state, real_batches(cfg), num_steps=2)
    assert int(state["step"]) == 2
    records = [
        json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert np.isfinite(records[0]["loss"])
