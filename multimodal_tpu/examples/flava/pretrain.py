"""FLAVA pretraining recipe (runnable CLI).

TPU-native analog of the reference native trainer
(``examples/flava/native/train.py``): one GSPMD ``Trainer`` replaces the
DDP/FSDP switch + autocast + grad scaler + hand-rolled logging. Config is
YAML + dotlist overrides (``utils/config.py``, the reference's
OmegaConf ``build_config`` at ``native/utils.py:30-36``).

Usage::

    python -m multimodal_tpu.examples.flava.pretrain \
        --config path/to.yaml model.size=900m train.steps=100 train.lr=1e-4

With ``data.path`` set (an on-disk HF arrow dataset, a jsonl file of
{image, text} samples, or an image folder), trains on the real-data layer:
``VLDataModule`` applies the two-way FLAVA image transform, WordPiece (or
hash-fallback) tokenization, MLM masking, and ITM negative pairing on the
host. Without a dataset path, trains on synthetic image/text batches —
useful for smoke/perf runs (the reference debug config does the same
scale-down).
"""

from __future__ import annotations

import argparse
import math
import os
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.models.flava.configs import FLAVA_CONFIGS
from multimodal_tpu.models.flava.model import flava_model_for_pretraining
from multimodal_tpu.modules.layers.moe import moe_aux_loss
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
        "path": None,            # dataset path -> real-data pipeline
        "image_key": "image",
        "text_key": "text",
        "vocab_path": None,      # WordPiece vocab file; hash fallback if None
        "itm_probability": 0.1,
        "batch_size": 8,
        "text_len": 77,
        "mlm_probability": 0.15,
        "seed": 0,
        "imagenet_path": None,   # image-folder/arrow dataset -> zero-shot eval
        "coco_path": None,       # caption dataset -> COCO retrieval eval
        "eval_batch_size": 64,
        "zero_shot_templates": None,  # cap on prompt templates (None = all 80)
    },
    "train": {
        "steps": 10,
        "lr": 1e-3,
        "warmup_steps": 2,
        "weight_decay": 0.1,
        "strategy": "fsdp",
        # pure-bf16 training: bf16 params + AnyPrecisionAdamW (bf16 m/v +
        # Kahan compensation) — the reference's anyprecision envelope
        # (optimizers/anyprecision.py:17-53); 8 bytes/param total state,
        # which is what fits 900m on one v5e chip and 10b on a v5e-16 pod
        "pure_bf16": False,
        "ep": 1,                 # expert-parallel mesh width (MoE configs)
        "grad_accum_steps": 1,
        "skip_nonfinite_updates": True,
        "checkpoint_dir": None,
        "checkpoint_every": None,
        "eval_every": None,
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


class HashTokenizer:
    """Deterministic vocab-free fallback: word -> stable id in [1000, vocab).
    Lets the real-data path run without shipping a 30k-line vocab file; swap
    in ``data.vocab_path`` for real WordPiece."""

    def __init__(self, vocab_size: int, max_length: int):
        self.max_length = max_length
        # word ids live in [base, vocab): below base are specials/reserved
        self.base = min(1000, max(104, vocab_size // 2))
        self.span = vocab_size - self.base
        if self.span < 1:
            raise ValueError(f"vocab_size={vocab_size} too small")

    def __call__(self, texts):
        import zlib

        out = np.zeros((len(texts), self.max_length), np.int64)
        for i, t in enumerate(texts):
            ids = [101] + [
                self.base + zlib.crc32(w.lower().encode()) % self.span
                for w in t.split()
            ][: self.max_length - 2] + [102]
            out[i, : len(ids)] = ids
        return out


def build_text_transform(cfg: Dict[str, Any]):
    d, m = cfg["data"], cfg["model"]
    if d["vocab_path"]:
        from multimodal_tpu.examples.mugen.bert_text_transform import BertTextTransform

        bert = BertTextTransform(d["vocab_path"], max_length=d["text_len"])

        def transform(texts):
            ids = bert(list(texts))
            out = np.full((len(texts), d["text_len"]), bert.pad_id, np.int64)
            out[:, : ids.shape[1]] = ids[:, : d["text_len"]]
            return out

        return transform
    return HashTokenizer(m["vocab_size"], d["text_len"])


def real_batches(cfg: Dict[str, Any], start_step: int = 0):
    """VLDataModule over an on-disk dataset (reference VLDataModule analog),
    or a StreamingVLDataModule when ``data.path`` points at webdataset tar
    shards (a ``.tar`` glob/dir — the pod-scale streaming input).

    ``start_step`` (the restored ``state["step"]`` on auto-resume) fast-
    forwards the stream so a resumed run continues on exactly the batches
    the interrupted run would have seen next."""
    from PIL import Image

    from multimodal_tpu.data.datamodules import VLDataModule
    from multimodal_tpu.data.datasets import load_dataset
    from multimodal_tpu.transforms.flava_transform import FLAVAImageTransform

    d, m = cfg["data"], cfg["model"]
    # streaming iff the path actually resolves to .tar shards: an explicit
    # flag, a .tar file/glob match, or a directory containing .tar members
    # (plain ".tar in path" would false-positive on e.g. dataset.tar.gz)
    path = str(d["path"])
    if d.get("streaming") is not None:
        streaming = bool(d["streaming"])
    elif os.path.isdir(path):
        streaming = any(f.endswith(".tar") for f in os.listdir(path))
    else:
        import glob as _glob

        matches = _glob.glob(path) if any(c in path for c in "*?[") else [path]
        streaming = bool(matches) and all(m.endswith(".tar") for m in matches)
    dataset = None if streaming else load_dataset(d["path"], split="train")
    n_patches = m["image_size"] // m["patch_size"]
    mask_patches = max(1, round(75 / 196 * n_patches * n_patches))
    flava_transform = FLAVAImageTransform(
        is_train=True,
        encoder_input_size=m["image_size"],
        codebook_input_size=n_patches * 8,  # dVAE downsamples 8x
        mask_window_size=n_patches,
        mask_num_patches=mask_patches,
        mask_min_patches=min(16, mask_patches),
        rng=np.random.RandomState(d["seed"]),
    )

    def image_transform(img):
        if isinstance(img, np.ndarray):
            img = Image.fromarray(np.asarray(img, np.uint8))
        return flava_transform.transform(img)

    collator = MLMCollator(
        vocab_size=m["vocab_size"], mask_token_id=103,
        mlm_probability=d["mlm_probability"], special_token_ids=(0, 101, 102),
        ignore_index=-1,
    )
    if streaming:
        from multimodal_tpu.data.webdataset import StreamingVLDataModule

        dm = StreamingVLDataModule(
            d["path"],
            image_transform=image_transform,
            text_transform=build_text_transform(cfg),
            mlm_collator=collator,
            itm_probability=d["itm_probability"],
            batch_size=d["batch_size"],
            seed=d["seed"],
            shuffle_buffer=d.get("shuffle_buffer", 1000),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
    else:
        dm = VLDataModule(
            dataset,
            image_transform=image_transform,
            text_transform=build_text_transform(cfg),
            mlm_collator=collator,
            itm_probability=d["itm_probability"],
            batch_size=d["batch_size"],
            seed=d["seed"],
            image_key=d["image_key"],
            text_key=d["text_key"],
        )
        if jax.process_count() > 1:
            # pod run: this host loads only its strided slice of each epoch
            # (batch_size above is the PER-HOST size; Trainer assembles the
            # global batch via make_array_from_process_local_data)
            from multimodal_tpu.data.multihost import HostShardedDataModule

            dm = HostShardedDataModule(dm)
    return dm.train_batches(start_step=start_step)


def build_zero_shot_eval(cfg: Dict[str, Any], model):
    """ImageNet zero-shot eval_fn for Trainer.fit (the reference callback at
    ``examples/flava/callbacks/multimodal_eval.py``, run over the full
    classnames x templates protocol from the data layer)."""
    import jax.numpy as jnp

    from multimodal_tpu.data.datamodules import ImageDataModule
    from multimodal_tpu.data.datasets import load_dataset
    from multimodal_tpu.data.imagenet_zeroshot import (
        imagenet_classnames,
        imagenet_templates,
        imagenet_zero_shot_eval,
    )
    from multimodal_tpu.transforms.flava_transform import FLAVAImageTransform

    d, m = cfg["data"], cfg["model"]
    dataset = load_dataset(d["imagenet_path"], split="val")
    # class names from the dataset when it carries them (image folders),
    # otherwise the canonical ImageNet-1k list
    if len(dataset) and isinstance(dataset[0], dict) and "classname" in dataset[0]:
        classnames = sorted({dataset[i]["classname"] for i in range(len(dataset))})
    else:
        classnames = imagenet_classnames()
    templates = imagenet_templates()
    if d["zero_shot_templates"]:
        templates = templates[: d["zero_shot_templates"]]
    eval_transform = FLAVAImageTransform(
        is_train=False, encoder_input_size=m["image_size"],
        codebook_input_size=8, mask_num_patches=1, mask_window_size=1,
        mask_min_patches=1,
    )

    def image_transform(img):
        from PIL import Image

        if isinstance(img, np.ndarray):
            img = Image.fromarray(np.asarray(img, np.uint8))
        return {"image": eval_transform.transform(img)["image"]}

    dm = ImageDataModule(
        dataset, image_transform=image_transform,
        batch_size=d["eval_batch_size"], shuffle=False, drop_last=False,
        prefetch=0,
    )
    tokenize = build_text_transform(cfg)

    def eval_fn(params):
        def encode_image(images):
            return model.apply(params, jnp.asarray(images), method=model.encode_image)

        def encode_text(tokens):
            return model.apply(params, jnp.asarray(tokens), method=model.encode_text)

        return imagenet_zero_shot_eval(
            encode_image, encode_text, tokenize, dm.eval_batches(),
            classnames=classnames, templates=templates,
        )

    return eval_fn


def _model_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    kwargs = dict(FLAVA_CONFIGS[cfg["model"]["size"]])
    kwargs.update(cfg["model"]["overrides"])
    return kwargs


def _build_model(cfg: Dict[str, Any]):
    m = cfg["model"]
    dtype = jnp.bfloat16 if m["bf16"] else jnp.float32
    param_dtype = (
        jnp.bfloat16 if cfg["train"]["pure_bf16"] else jnp.float32
    )
    return flava_model_for_pretraining(
        vocab_size=m["vocab_size"],
        image_size=m["image_size"],
        patch_size=m["patch_size"],
        dtype=dtype,
        param_dtype=param_dtype,
        **_model_kwargs(cfg),
    )


def build_trainer_and_state(cfg: Dict[str, Any]):
    m, t = cfg["model"], cfg["train"]
    model = _build_model(cfg)

    sample = next(synthetic_batches(cfg))
    b = cfg["data"]["batch_size"]
    n_patches = m["image_size"] // m["patch_size"]
    # jitted init: eager init of a 350M-param model over a remote-TPU
    # link round-trips per op and takes minutes; one compiled program doesn't
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        image=jnp.asarray(sample["image"]),
        text=jnp.asarray(sample["text"]),
        text_masked=jnp.asarray(sample["text_masked"]),
        itm_labels=jnp.asarray(sample["itm_labels"]),
        mlm_labels=jnp.asarray(sample["mlm_labels"]),
        # init the dVAE codebook path too, so real-data batches (which carry
        # image_for_codebook + image_patches_mask) can exercise MIM; the dVAE
        # downsamples 8x, so its input is 8px per patch-grid cell
        image_for_codebook=jnp.zeros((b, n_patches * 8, n_patches * 8, 3), jnp.float32),
        image_patches_mask=jnp.zeros((b, n_patches, n_patches), jnp.int32),
    )

    moe_on = bool(_model_kwargs(cfg).get("moe_num_experts"))

    def loss_fn(params, batch, rng):
        apply_kwargs = dict(
            image=batch["image"],
            text=batch["text"],
            text_masked=batch["text_masked"],
            itm_labels=batch["itm_labels"],
            mlm_labels=batch["mlm_labels"],
            image_for_codebook=batch.get("image_for_codebook"),
            image_patches_mask=batch.get("image_patches_mask"),
        )
        if moe_on:
            # router aux losses are sown into `intermediates` by every MoE
            # layer across the three towers; they join the objective here
            out, inter = model.apply(
                params, mutable=["intermediates"], **apply_kwargs
            )
            moe_loss = moe_aux_loss(inter["intermediates"])
        else:
            out = model.apply(params, **apply_kwargs)
            moe_loss = None
        losses = out.losses
        aux = {
            name: value
            for name, value in losses._asdict().items()
            if value is not None
        }
        total = losses.total()
        if moe_loss is not None:
            aux["moe_aux"] = moe_loss
            total = total + moe_loss
        return total, aux

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, t["lr"], t["warmup_steps"], max(t["steps"], t["warmup_steps"] + 1)
    )
    if t["pure_bf16"]:
        from multimodal_tpu.modules.optimizers import anyprecision_adamw

        optimizer = anyprecision_adamw(
            schedule, weight_decay=t["weight_decay"],
            use_kahan_summation=True, momentum_dtype=jnp.bfloat16,
        )
    else:
        optimizer = optax.adamw(schedule, weight_decay=t["weight_decay"])

    # MoE runs shard experts over a dp x ep mesh through the rule-based
    # ("tp") strategy; dense runs keep the fsdp-everything default.
    ep = int(t["ep"])
    if ep > 1:
        mesh = create_mesh(dp=-1, fsdp=1, tp=1, ep=ep)
        strategy = "tp"
    else:
        mesh = create_mesh(dp=1, fsdp=-1, tp=1)
        strategy = t["strategy"]
    trainer = Trainer(
        loss_fn,
        optimizer,
        strategy=strategy,
        mesh=mesh,
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
    data = (
        real_batches(cfg, start_step=int(state["step"]))
        if cfg["data"]["path"] else synthetic_batches(cfg)
    )
    eval_fns = []
    if cfg["data"]["imagenet_path"]:
        # note: eval_fn closes over the model built inside
        # build_trainer_and_state; rebuild the same module (cheap, stateless)
        eval_fns.append(build_zero_shot_eval(cfg, _build_model(cfg)))
    if cfg["data"].get("coco_path"):
        from multimodal_tpu.examples.flava.coco_zero_shot import build_coco_eval

        eval_fns.append(build_coco_eval(cfg, _build_model(cfg)))
    eval_fn = None
    if eval_fns:
        def eval_fn(params, _fns=tuple(eval_fns)):
            merged = {}
            for fn in _fns:
                merged.update(fn(params))
            return merged
    # On auto-resume, train only the REMAINING steps: the restored step plus
    # num_steps must land on the configured total or the cosine schedule
    # overshoots and interrupted != uninterrupted at the recipe level.
    remaining = max(0, int(cfg["train"]["steps"]) - int(state["step"]))
    state = trainer.fit(
        state,
        data,
        num_steps=remaining,
        checkpoint_every=cfg["train"]["checkpoint_every"],
        eval_fn=eval_fn,
        eval_every=cfg["train"].get("eval_every"),
    )
    print(f"finished at step {int(state['step'])}", flush=True)


if __name__ == "__main__":
    main()
