"""FLAVA pretraining recipe (runnable CLI).

TPU-native analog of the reference native trainer
(``examples/flava/native/train.py``): one GSPMD ``Trainer`` replaces the
DDP/FSDP switch + autocast + grad scaler + hand-rolled logging. Config is
YAML + dotlist overrides (``utils/config.py``, the reference's
OmegaConf ``build_config`` at ``native/utils.py:30-36``).

Usage::

    python -m multimodal_tpu.examples.flava.pretrain \
        --config path/to.yaml model.size=900m train.steps=100 train.lr=1e-4

Without a dataset path, trains on synthetic image/text batches — useful for
smoke/perf runs (the reference debug config does the same scale-down).
"""

from __future__ import annotations

import argparse
import math
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.models.flava.configs import FLAVA_CONFIGS
from multimodal_tpu.models.flava.model import flava_model_for_pretraining
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.training.mlm_collator import MLMCollator
from multimodal_tpu.training.trainer import Trainer
from multimodal_tpu.utils.config import build_config

DEFAULTS: Dict[str, Any] = {
    "model": {
        "size": "base",          # key into FLAVA_CONFIGS
        "vocab_size": 30522,
        "image_size": 224,
        "patch_size": 16,
        "bf16": True,
        "overrides": {},         # extra flava_model kwargs (debug scale-downs)
    },
    "data": {
        "batch_size": 8,
        "text_len": 77,
        "mlm_probability": 0.15,
        "seed": 0,
    },
    "train": {
        "steps": 10,
        "lr": 1e-3,
        "warmup_steps": 2,
        "weight_decay": 0.1,
        "strategy": "fsdp",
        "grad_accum_steps": 1,
        "skip_nonfinite_updates": True,
        "checkpoint_dir": None,
        "checkpoint_every": None,
        "log_dir": None,
        "log_interval": 1,
    },
}


def synthetic_batches(cfg: Dict[str, Any]) -> Iterator[Dict[str, np.ndarray]]:
    """Random image/text pairs with MLM masking and ITM labels."""
    d, m = cfg["data"], cfg["model"]
    rng = np.random.RandomState(d["seed"])
    collator = MLMCollator(
        vocab_size=m["vocab_size"], mask_token_id=103,
        mlm_probability=d["mlm_probability"], special_token_ids=(0, 101, 102),
        ignore_index=-1, rng=rng,
    )
    b, s = d["batch_size"], d["text_len"]
    while True:
        low = min(1000, m["vocab_size"] // 2)
        text = rng.randint(low, m["vocab_size"], (b, s))
        text_masked, mlm_labels = collator(text)
        yield {
            "image": rng.rand(b, m["image_size"], m["image_size"], 3).astype(np.float32),
            "text": text.astype(np.int32),
            "text_masked": text_masked.astype(np.int32),
            "mlm_labels": mlm_labels.astype(np.int32),
            "itm_labels": rng.randint(0, 2, (b,)).astype(np.int32),
        }


def build_trainer_and_state(cfg: Dict[str, Any]):
    m, t = cfg["model"], cfg["train"]
    dtype = jnp.bfloat16 if m["bf16"] else jnp.float32
    kwargs = dict(FLAVA_CONFIGS[m["size"]])
    kwargs.update(m["overrides"])
    model = flava_model_for_pretraining(
        vocab_size=m["vocab_size"],
        image_size=m["image_size"],
        patch_size=m["patch_size"],
        dtype=dtype,
        **kwargs,
    )

    sample = next(synthetic_batches(cfg))
    params = model.init(
        jax.random.PRNGKey(0),
        image=jnp.asarray(sample["image"]),
        text=jnp.asarray(sample["text"]),
        text_masked=jnp.asarray(sample["text_masked"]),
        itm_labels=jnp.asarray(sample["itm_labels"]),
        mlm_labels=jnp.asarray(sample["mlm_labels"]),
    )

    def loss_fn(params, batch, rng):
        out = model.apply(
            params,
            image=batch["image"],
            text=batch["text"],
            text_masked=batch["text_masked"],
            itm_labels=batch["itm_labels"],
            mlm_labels=batch["mlm_labels"],
        )
        losses = out.losses
        aux = {
            name: value
            for name, value in losses._asdict().items()
            if value is not None
        }
        return losses.total(), aux

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, t["lr"], t["warmup_steps"], max(t["steps"], t["warmup_steps"] + 1)
    )
    optimizer = optax.adamw(schedule, weight_decay=t["weight_decay"])

    trainer = Trainer(
        loss_fn,
        optimizer,
        strategy=t["strategy"],
        mesh=create_mesh(dp=1, fsdp=-1, tp=1),
        checkpoint_dir=t["checkpoint_dir"],
        log_dir=t["log_dir"],
        log_interval=t["log_interval"],
        skip_nonfinite_updates=t["skip_nonfinite_updates"],
        grad_accum_steps=t["grad_accum_steps"],
    )
    state = trainer.restore_or_init(params)
    return trainer, state


def main(argv=None) -> None:
    import os

    # Some TPU runtimes force-register their platform from sitecustomize,
    # overriding JAX_PLATFORMS; re-assert the user's choice.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    parser = argparse.ArgumentParser(description="FLAVA pretraining")
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("overrides", nargs="*", help="dotlist overrides a.b=c")
    args = parser.parse_args(argv)
    cfg = build_config(args.config, args.overrides, defaults=DEFAULTS)

    trainer, state = build_trainer_and_state(cfg)
    n_params = sum(
        int(math.prod(p.shape)) for p in jax.tree_util.tree_leaves(state["params"])
    )
    print(f"model={cfg['model']['size']} params={n_params / 1e6:.1f}M "
          f"devices={jax.device_count()} strategy={cfg['train']['strategy']}",
          flush=True)
    state = trainer.fit(
        state,
        synthetic_batches(cfg),
        num_steps=cfg["train"]["steps"],
        checkpoint_every=cfg["train"]["checkpoint_every"],
    )
    print(f"finished at step {int(state['step'])}", flush=True)


if __name__ == "__main__":
    main()
