"""Omnivore multi-task training recipe (runnable CLI).

TPU-native analog of the reference Omnivore trainer
(``examples/omnivore/train.py:268``): one Swin3D trunk trained on
image/video/RGBD batches interleaved by the deterministic
``MultiDataLoader`` (the reference synchronizes loader choice with
``broadcast_object_list``; here the choice is a seeded pure function so
every host agrees without a collective).

The jitted step dispatches the head on the batch's shape — each modality
has a distinct (time, channels) signature, so jit specializes one executable
per modality and ``input_type`` never needs to be traced:
    (b, 1, h, w, 3) -> image    (b, T>1, h, w, 3) -> video
    (b, 1, h, w, 4) -> rgbd
EMA of params (``training/ema.py``) mirrors the reference's --model-ema.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.models.omnivore import _omnivore
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.training.multidata import MultiDataLoader
from multimodal_tpu.training.trainer import Trainer
from multimodal_tpu.utils.config import build_config

DEFAULTS: Dict[str, Any] = {
    "model": {"embed_dim": 96, "depths": [2, 2, 6, 2], "heads": [3, 6, 12, 24]},
    "data": {
        "batch_size": 8, "image_size": 224, "video_frames": 8, "seed": 0,
        # on-disk datasets (reference examples/omnivore/train.py:268 runs on
        # ImageNet / Kinetics / SUN RGB-D); None -> synthetic for that
        # modality. Each is a load_dataset source (jsonl/arrow/imagefolder).
        "image_path": None,
        "video_path": None,
        "rgbd_path": None,
        "sample_every_n_frames": 2,
        # per-modality round-robin weights (reference data_builder.py:247)
        "sampling_factors": None,
        "eval_batches": 8,        # val batches per modality in the eval_fn
    },
    "train": {"steps": 9, "lr": 1e-3, "weight_decay": 0.05, "strategy": "ddp",
              "log_dir": None, "log_interval": 1, "checkpoint_dir": None,
              "eval_every": None},
}

NUM_CLASSES = {"image": 1000, "video": 400, "rgbd": 19}


def input_type_of(x: jnp.ndarray) -> str:
    """Infer the head from the batch signature (see module docstring)."""
    if x.shape[-1] == 4:
        return "rgbd"
    return "video" if x.shape[1] > 1 else "image"


def synthetic_loaders(cfg: Dict[str, Any]) -> Dict[str, Iterator]:
    d = cfg["data"]
    b, s, t = d["batch_size"], d["image_size"], d["video_frames"]

    def gen(shape, n_classes, seed):
        rng = np.random.RandomState(seed)
        while True:
            yield {"x": rng.rand(*shape).astype(np.float32),
                   "label": rng.randint(0, n_classes, (shape[0],))}

    return {
        "image": gen((b, 1, s, s, 3), NUM_CLASSES["image"], d["seed"]),
        "video": gen((b, t, s, s, 3), NUM_CLASSES["video"], d["seed"] + 1),
        "rgbd": gen((b, 1, s, s, 4), NUM_CLASSES["rgbd"], d["seed"] + 2),
    }


def _resize_hw(arr: np.ndarray, size: int) -> np.ndarray:
    """Bilinear host resize of (h, w, c) float arrays, any channel count
    (PIL mode 'F' per channel — covers the RGBD 4-channel case)."""
    from PIL import Image

    if arr.shape[0] == size and arr.shape[1] == size:
        return arr
    chans = [
        np.asarray(
            Image.fromarray(arr[..., c].astype(np.float32), mode="F").resize(
                (size, size), Image.BILINEAR
            )
        )
        for c in range(arr.shape[-1])
    ]
    return np.stack(chans, axis=-1)


def _adapt(batches: Iterator, key: str, size: int, add_time: bool) -> Iterator:
    """Map datamodule batches ({image|video|rgbd, labels}) onto the trainer's
    {x, label} signature with the (b, T, h, w, c) layout the heads expect."""
    for batch in batches:
        x = np.stack([_resize_hw(np.asarray(v, np.float32), size)
                      for v in batch[key]]) if batch[key].ndim == 4 else \
            np.stack([
                np.stack([_resize_hw(np.asarray(f, np.float32), size)
                          for f in clip])
                for clip in batch[key]
            ])
        if add_time:
            x = x[:, None]
        yield {"x": x, "label": np.asarray(batch["labels"], np.int64)}


def _real_datamodules(cfg: Dict[str, Any], split: str) -> Dict[str, Any]:
    """On-disk datamodules per modality (reference train.py:268 builds
    ImageNet/Kinetics/SUN-RGBD loaders; here any load_dataset source)."""
    from multimodal_tpu.data.datamodules import ImageDataModule
    from multimodal_tpu.data.datasets import load_dataset
    from multimodal_tpu.examples.omnivore.data import (
        SunRGBDDataModule,
        VideoClipDataModule,
    )

    d = cfg["data"]
    common = dict(batch_size=d["batch_size"], seed=d["seed"], prefetch=0,
                  shuffle=split == "train", drop_last=split == "train")
    modules: Dict[str, Any] = {}
    if d["image_path"]:
        modules["image"] = ImageDataModule(
            load_dataset(d["image_path"], split=split),
            image_transform=lambda img: {
                "image": np.asarray(img, np.float32) / 255.0
                if np.asarray(img).dtype == np.uint8 else np.asarray(img, np.float32)
            },
            **common,
        )
    if d["video_path"]:
        modules["video"] = VideoClipDataModule(
            load_dataset(d["video_path"], split=split),
            sequence_length=d["video_frames"],
            sample_every_n_frames=d["sample_every_n_frames"],
            random_start=split == "train",
            **common,
        )
    if d["rgbd_path"]:
        modules["rgbd"] = SunRGBDDataModule(
            load_dataset(d["rgbd_path"], split=split), **common,
        )
    return modules


def real_loaders(cfg: Dict[str, Any], split: str = "train") -> Dict[str, Iterator]:
    size = cfg["data"]["image_size"]
    keys = {"image": ("image", True), "video": ("video", False),
            "rgbd": ("rgbd", True)}
    out: Dict[str, Iterator] = {}
    for name, dm in _real_datamodules(cfg, split).items():
        key, add_time = keys[name]
        batches = dm.train_batches() if split == "train" else dm.eval_batches()
        out[name] = _adapt(batches, key, size, add_time)
    return out


def build_eval_fn(cfg: Dict[str, Any], model):
    """Val top-1 accuracy per available modality (the reference val loop)."""
    d = cfg["data"]

    def eval_fn(params) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        for name, batches in real_loaders(cfg, split="val").items():
            correct = total = 0
            for i, batch in enumerate(batches):
                if i >= d["eval_batches"]:
                    break
                logits = model.apply(
                    params, jnp.asarray(batch["x"]), input_type_of(batch["x"])
                )
                correct += int(np.sum(
                    np.argmax(np.asarray(logits), -1) == batch["label"]
                ))
                total += len(batch["label"])
            if total:
                metrics[f"{name}_top1"] = correct / total
        return metrics

    return eval_fn


def build_trainer_and_state(cfg: Dict[str, Any]):
    m, t = cfg["model"], cfg["train"]
    model = _omnivore(m["embed_dim"], tuple(m["depths"]), tuple(m["heads"]))

    loaders = synthetic_loaders(cfg)
    # init with an RGBD batch: it exercises both the RGB and the depth
    # patch-embed convs, and the Omnivore init hook materializes every head
    sample = next(iter(loaders["rgbd"]))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(sample["x"]), "rgbd")

    def loss_fn(params, batch, rng):
        x = batch["x"]
        kind = input_type_of(x)  # static per jit specialization
        logits = model.apply(params, x, kind)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]
        ).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == batch["label"])
        return loss, {f"{kind}_loss": loss, f"{kind}_acc": acc}

    trainer = Trainer(
        loss_fn,
        optax.adamw(t["lr"], weight_decay=t["weight_decay"]),
        strategy=t["strategy"],
        mesh=create_mesh(dp=-1, fsdp=1, tp=1) if t["strategy"] == "ddp"
        else create_mesh(dp=1, fsdp=-1, tp=1),
        log_dir=t["log_dir"],
        log_interval=t["log_interval"],
        checkpoint_dir=t["checkpoint_dir"],
    )
    state = trainer.restore_or_init(params)
    return trainer, state, loaders


def main(argv=None) -> None:
    import os

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    parser = argparse.ArgumentParser(description="Omnivore multi-task training")
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = build_config(args.config, args.overrides, defaults=DEFAULTS)

    trainer, state, loaders = build_trainer_and_state(cfg)
    d = cfg["data"]
    use_real = d["image_path"] or d["video_path"] or d["rgbd_path"]
    if use_real:
        loaders = real_loaders(cfg, split="train")
        if not loaders:
            raise SystemExit("no dataset produced any loader")
    factors = d["sampling_factors"]
    if factors:
        from multimodal_tpu.training.multidata import make_weighted_sampling

        names = list(loaders)
        keep = [n for n, f in zip(names, factors) if f > 0]
        data = MultiDataLoader(
            {n: loaders[n] for n in keep},
            sampling_fn=make_weighted_sampling([f for f in factors if f > 0]),
            seed=d["seed"],
        )
    else:
        data = MultiDataLoader(loaders, seed=d["seed"])
    eval_fn = None
    if use_real:
        from multimodal_tpu.models.omnivore import _omnivore

        m = cfg["model"]
        eval_fn = build_eval_fn(
            cfg, _omnivore(m["embed_dim"], tuple(m["depths"]), tuple(m["heads"]))
        )
    state = trainer.fit(
        state, data, num_steps=cfg["train"]["steps"],
        eval_fn=eval_fn, eval_every=cfg["train"]["eval_every"],
    )
    print(f"finished at step {int(state['step'])}", flush=True)


if __name__ == "__main__":
    main()
