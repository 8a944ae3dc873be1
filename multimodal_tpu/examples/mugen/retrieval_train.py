"""MUGEN VideoCLIP retrieval training.

Parity with reference ``examples/mugen/retrieval/train.py:1-67`` +
``retrieval/model.py`` (``VideoCLIPLightningModule``): the S3D-video x
DistilBERT-text towers train with a learnable-temperature contrastive loss
(logit_scale init 0.07, max 100 — the reference module's MUGEN defaults),
AdamW (lr 1e-3, wd 1e-3), and validation reports Recall@{1,5,10} both
directions over the val split (``_compute_recall``). TPU-native: the
Lightning module/strategy plumbing collapses into the generic GSPMD
``Trainer`` + ``MUGENDataModule`` + the one-jit recall computation in
``training/retrieval_eval.py``.
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.examples.mugen.bert_text_transform import BertTextTransform
from multimodal_tpu.examples.mugen.data import MUGENDataModule
from multimodal_tpu.examples.mugen.video_clip import TextEncoder, VideoEncoder
from multimodal_tpu.models.clip.model import _l2_normalize
from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
    ContrastiveLossWithTemperature,
)
from multimodal_tpu.training.retrieval_eval import retrieval_recall_at_k
from multimodal_tpu.utils.config import build_config

DEFAULTS: Dict[str, Any] = {
    "model": {
        "video_proj_out": 256,
        "text_proj_out": 256,
        "vocab_size": 30522,
        "bf16": False,
        "logit_scale": 0.07,       # reference VideoCLIPLightningModule defaults
        "logit_scale_max": 100.0,
    },
    "data": {
        "path": None,              # dir with {split}.json release metadata
        "frames_dir": None,        # {id}.npy pre-rendered clips
        "vocab_path": None,        # WordPiece vocab; tiny hash fallback if None
        "sequence_length": 32,
        "sample_every_n_frames": 3,
        "text_len": 32,
        "batch_size": 16,
        "eval_batch_size": 16,
        "seed": 0,
    },
    "train": {
        "steps": 1000,
        "lr": 1e-3,                # reference defaults (model.py:27-29)
        "weight_decay": 1e-3,
        "strategy": "fsdp",
        "checkpoint_dir": None,
        "checkpoint_every": None,
        "eval_every": None,
        "log_dir": None,
        "log_interval": 10,
    },
}


class VideoCLIPForRetrieval(nn.Module):
    """VideoCLIP towers + learnable temperature in one param tree (the
    reference Lightning module owns model + ContrastiveLossWithTemperature;
    here both are submodules so one optimizer step covers everything).
    Tower param names match ``video_clip.videoclip``'s CLIP wrapper
    (encoder_a = video, encoder_b = text) for checkpoint compatibility."""

    video_proj_out: int = 256
    text_proj_out: int = 256
    vocab_size: int = 30522
    logit_scale_init: float = 0.07
    logit_scale_max: float = 100.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder_a = VideoEncoder(self.video_proj_out, **common)
        self.encoder_b = TextEncoder(self.text_proj_out, self.vocab_size, **common)
        self.contrastive_loss = ContrastiveLossWithTemperature(
            logit_scale_init=self.logit_scale_init,
            logit_scale_min=None,
            logit_scale_max=self.logit_scale_max,
        )

    def encode_video(self, video: jnp.ndarray, deterministic: bool = True):
        return _l2_normalize(self.encoder_a(video, deterministic))

    def encode_text(self, text: jnp.ndarray, deterministic: bool = True):
        return _l2_normalize(self.encoder_b(text, deterministic))

    def __call__(
        self, video: jnp.ndarray, text: jnp.ndarray, deterministic: bool = True
    ):
        v = self.encode_video(video, deterministic)
        t = self.encode_text(text, deterministic)
        return self.contrastive_loss(v, t)


def build_text_transform(cfg: Dict[str, Any]) -> Callable:
    d = cfg["data"]
    if d["vocab_path"]:
        return BertTextTransform(d["vocab_path"], max_length=d["text_len"])

    # offline-friendly fallback: stable hash tokenizer (same scheme as the
    # FLAVA recipe's) so the recipe runs without a vocab file
    vocab_size = cfg["model"]["vocab_size"]

    def transform(texts):
        out = np.zeros((len(texts), d["text_len"]), np.int32)
        for i, t in enumerate(texts):
            words = str(t).lower().split()[: d["text_len"] - 2]
            ids = [101] + [
                1000 + (hash(w) % (vocab_size - 2000)) for w in words
            ] + [102]
            out[i, : len(ids)] = ids
        return out

    return transform


def build_datamodule(cfg: Dict[str, Any], split: str) -> MUGENDataModule:
    d = cfg["data"]
    return MUGENDataModule(
        d["path"],
        d["frames_dir"],
        split=split,
        text_transform=build_text_transform(cfg),
        sequence_length=d["sequence_length"],
        sample_every_n_frames=d["sample_every_n_frames"],
        fixed_start_idx=split != "train",
        random_text=split == "train",
        text_len=d["text_len"],
        batch_size=d["batch_size"] if split == "train" else d["eval_batch_size"],
        shuffle=split == "train",
        drop_last=split == "train",
        seed=d["seed"],
    )


def build_retrieval_eval(cfg: Dict[str, Any], model) -> Callable:
    """Trainer eval_fn: encode the val split, Recall@{1,5,10} both
    directions (reference model.py:73-87 naming: v2t = video query)."""
    val_dm = build_datamodule(cfg, split="val")

    def eval_fn(params) -> Dict[str, float]:
        v_emb, t_emb = [], []
        for batch in val_dm.eval_batches():
            v_emb.append(np.asarray(model.apply(
                params, jnp.asarray(batch["video"]), method=model.encode_video
            ), np.float32))
            t_emb.append(np.asarray(model.apply(
                params, jnp.asarray(batch["text"]), method=model.encode_text
            ), np.float32))
        recalls = retrieval_recall_at_k(
            jnp.asarray(np.concatenate(v_emb)), jnp.asarray(np.concatenate(t_emb))
        )
        return {
            **{f"v2t_recall_{k}": recalls[f"a2b_recall_{k}"] for k in (1, 5, 10)},
            **{f"t2v_recall_{k}": recalls[f"b2a_recall_{k}"] for k in (1, 5, 10)},
        }

    return eval_fn


def build_trainer_and_state(cfg: Dict[str, Any], model=None):
    import optax

    from multimodal_tpu.parallel.mesh import create_mesh
    from multimodal_tpu.training.trainer import Trainer

    m, t, d = cfg["model"], cfg["train"], cfg["data"]
    if model is None:
        model = VideoCLIPForRetrieval(
            video_proj_out=m["video_proj_out"],
            text_proj_out=m["text_proj_out"],
            vocab_size=m["vocab_size"],
            logit_scale_init=m["logit_scale"],
            logit_scale_max=m["logit_scale_max"],
            dtype=jnp.bfloat16 if m["bf16"] else jnp.float32,
        )

    def loss_fn(params, model_state, batch, rng):
        # S3D carries BatchNorm running stats: train-mode apply mutates the
        # batch_stats collection, returned through the Trainer's
        # mutable_state channel (never touched by the optimizer)
        loss, updated = model.apply(
            {**params, **model_state},
            batch["video"], batch["text"], deterministic=False,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        return loss, {}, dict(updated)

    trainer = Trainer(
        loss_fn,
        optax.adamw(t["lr"], weight_decay=t["weight_decay"]),
        strategy=t["strategy"],
        mesh=create_mesh(dp=1, fsdp=-1, tp=1),
        checkpoint_dir=t["checkpoint_dir"],
        log_dir=t["log_dir"],
        log_interval=t["log_interval"],
        mutable_state=True,
    )
    video = jnp.zeros(
        (1, d["sequence_length"], 64, 64, 3), jnp.float32
    )
    text = jnp.zeros((1, d["text_len"]), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), video, text)
    variables = dict(variables)
    model_state = {"batch_stats": variables.pop("batch_stats")} \
        if "batch_stats" in variables else {}
    state = trainer.restore_or_init(variables, model_state)
    return model, trainer, state


def main(argv=None):
    parser = argparse.ArgumentParser(description="MUGEN VideoCLIP retrieval training")
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("overrides", nargs="*", help="dotlist overrides a.b=c")
    args = parser.parse_args(argv)
    cfg = build_config(args.config, args.overrides, defaults=DEFAULTS)
    if not cfg["data"]["path"] or not cfg["data"]["frames_dir"]:
        raise SystemExit("set data.path=<release json dir> data.frames_dir=<npy dir>")

    model, trainer, state = build_trainer_and_state(cfg)
    eval_fn: Optional[Callable] = build_retrieval_eval(cfg, model)
    state = trainer.fit(
        state,
        build_datamodule(cfg, split="train").train_batches(),
        num_steps=cfg["train"]["steps"],
        checkpoint_every=cfg["train"]["checkpoint_every"],
        eval_fn=eval_fn,
        eval_every=cfg["train"]["eval_every"],
    )
    print(f"finished at step {int(state['step'])}", flush=True)
    return state


if __name__ == "__main__":
    main()
