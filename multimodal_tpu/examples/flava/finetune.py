"""FLAVA classification fine-tuning recipe (runnable CLI).

Analog of the reference Lightning fine-tune entrypoint
(``examples/flava/finetune.py`` + ``FLAVAClassificationLightningModule``):
multimodal (image+text) classification with a fresh MLP head over the mm CLS
token, one GSPMD Trainer, YAML config + dotlist overrides. Synthetic data by
default for smoke/perf runs.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.models.flava.configs import FLAVA_CONFIGS
from multimodal_tpu.models.flava.model import flava_model_for_classification
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.training.trainer import Trainer
from multimodal_tpu.utils.config import build_config

DEFAULTS: Dict[str, Any] = {
    "model": {
        "size": "base",
        "num_classes": 2,           # e.g. hateful-memes binary
        "vocab_size": 30522,
        "image_size": 224,
        "patch_size": 16,
        "overrides": {},
    },
    "data": {
        "batch_size": 8, "text_len": 77, "seed": 0,
        # on-disk labeled dataset ({image, text, label} samples, e.g.
        # hateful-memes jsonl) -> the real VLDataModule pipeline;
        # None -> synthetic smoke/perf batches
        "path": None,
        "image_key": "image",
        "text_key": "text",
        "label_key": "label",
        "vocab_path": None,
    },
    "train": {"steps": 10, "lr": 1e-4, "weight_decay": 0.1, "strategy": "fsdp",
              "log_dir": None, "log_interval": 1, "checkpoint_dir": None},
}


def synthetic_batches(cfg: Dict[str, Any]) -> Iterator[Dict[str, np.ndarray]]:
    d, m = cfg["data"], cfg["model"]
    rng = np.random.RandomState(d["seed"])
    b, s = d["batch_size"], d["text_len"]
    while True:
        yield {
            "image": rng.rand(b, m["image_size"], m["image_size"], 3).astype(np.float32),
            "text": rng.randint(1, m["vocab_size"], (b, s)).astype(np.int32),
            "labels": rng.randint(0, m["num_classes"], (b,)).astype(np.int32),
        }


def real_batches(cfg: Dict[str, Any]) -> Iterator[Dict[str, np.ndarray]]:
    """Labeled image+text batches through the real data layer (reference
    FLAVAClassificationDataModule: image transform + tokenizer + labels).
    Reuses VLDataModule (itm/mlm disabled) with the label passed through."""
    from PIL import Image

    from multimodal_tpu.data.datamodules import VLDataModule, _to_image
    from multimodal_tpu.data.datasets import load_dataset
    from multimodal_tpu.examples.flava.pretrain import build_text_transform
    from multimodal_tpu.transforms.flava_transform import FLAVAImageTransform

    d, m = cfg["data"], cfg["model"]

    class ClassificationVLDataModule(VLDataModule):
        def process(self, sample, rng):
            out = super().process(sample, rng)
            out["labels"] = np.asarray(sample[d["label_key"]], np.int32)
            return out

    flava_transform = FLAVAImageTransform(
        is_train=True, encoder_input_size=m["image_size"],
        codebook_input_size=8, mask_num_patches=1, mask_window_size=1,
        mask_min_patches=1, rng=np.random.RandomState(d["seed"]),
    )

    def image_transform(img):
        img = _to_image(img)
        if isinstance(img, np.ndarray):
            img = Image.fromarray(np.asarray(img, np.uint8))
        return {"image": flava_transform.transform(img)["image"]}

    dm = ClassificationVLDataModule(
        load_dataset(d["path"], split="train"),
        image_transform=image_transform,
        text_transform=build_text_transform(cfg),
        mlm_collator=None,
        itm_probability=0.0,
        image_key=d["image_key"],
        text_key=d["text_key"],
        batch_size=d["batch_size"],
        seed=d["seed"],
    )
    return dm.train_batches()


def build_trainer_and_state(cfg: Dict[str, Any]):
    m, t = cfg["model"], cfg["train"]
    kwargs = dict(FLAVA_CONFIGS[m["size"]])
    kwargs.update(m["overrides"])
    hidden = kwargs.get("multimodal_hidden_size", 768)
    model = flava_model_for_classification(
        num_classes=m["num_classes"],
        classifier_in_dim=hidden,
        classifier_hidden_sizes=hidden,
        vocab_size=m["vocab_size"],
        image_size=m["image_size"],
        patch_size=m["patch_size"],
        **kwargs,
    )

    sample = next(synthetic_batches(cfg))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        image=jnp.asarray(sample["image"]),
        text=jnp.asarray(sample["text"]),
        labels=jnp.asarray(sample["labels"]),
    )

    def loss_fn(params, batch, rng):
        out = model.apply(
            params, image=batch["image"], text=batch["text"], labels=batch["labels"]
        )
        acc = jnp.mean(jnp.argmax(out.logits, -1) == batch["labels"])
        return out.loss, {"accuracy": acc}

    trainer = Trainer(
        loss_fn,
        optax.adamw(t["lr"], weight_decay=t["weight_decay"]),
        strategy=t["strategy"],
        mesh=create_mesh(dp=1, fsdp=-1, tp=1),
        log_dir=t["log_dir"],
        log_interval=t["log_interval"],
        checkpoint_dir=t["checkpoint_dir"],
    )
    state = trainer.restore_or_init(params)
    return trainer, state


def main(argv=None) -> None:
    import os

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    parser = argparse.ArgumentParser(description="FLAVA classification fine-tune")
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = build_config(args.config, args.overrides, defaults=DEFAULTS)

    trainer, state = build_trainer_and_state(cfg)
    data = real_batches(cfg) if cfg["data"]["path"] else synthetic_batches(cfg)
    state = trainer.fit(state, data, num_steps=cfg["train"]["steps"])
    print(f"finished at step {int(state['step'])}", flush=True)


if __name__ == "__main__":
    main()
