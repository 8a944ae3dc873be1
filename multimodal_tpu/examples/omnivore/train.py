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
    "data": {"batch_size": 8, "image_size": 224, "video_frames": 8, "seed": 0},
    "train": {"steps": 9, "lr": 1e-3, "weight_decay": 0.05, "strategy": "ddp",
              "log_dir": None, "log_interval": 1, "checkpoint_dir": None},
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
    data = MultiDataLoader(loaders, seed=cfg["data"]["seed"])
    state = trainer.fit(state, data, num_steps=cfg["train"]["steps"])
    print(f"finished at step {int(state['step'])}", flush=True)


if __name__ == "__main__":
    main()
