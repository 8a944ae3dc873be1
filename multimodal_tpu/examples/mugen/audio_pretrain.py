"""AudioMAE pretraining on MUGEN game audio — the end-to-end consumer of
the dataset's third modality.

Parity surface: reference ``examples/mugen/data/mugen_dataset.py:226``
(``get_game_audio`` provides 22050 Hz x 3.2 s stereo per clip) combined
with the AudioMAE pretraining stack (``masked_auto_encoder`` + the Kaldi
fbank transforms, reference ``examples/mae``): the MUGEN loader yields
audio batches, waveforms are mono-mixed and turned into log-mel fbank
"images", and the Swin-decoder AudioMAE trains its masked-reconstruction
objective through the generic Trainer.
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.examples.mugen.audio_utils import AUDIO_SAMPLE_RATE
from multimodal_tpu.examples.mugen.data import MUGENDataModule
from multimodal_tpu.models.masked_auto_encoder.model import audio_mae
from multimodal_tpu.transforms.mae_transform import AudioPretrainTransform
from multimodal_tpu.utils.config import build_config

DEFAULTS: Dict[str, Any] = {
    "model": {
        "size": "small",            # small | base
        "target_length": 256,       # fbank frames (3.2 s @ 10 ms shift ~ 318)
        "melbins": 128,
        "masking_ratio": 0.8,
        "bf16": False,
    },
    "data": {
        "path": None,               # dir with {split}.json release metadata
        "frames_dir": None,         # {id}.npy clips ({id}.wav audio alongside)
        "audio_dir": None,          # defaults to frames_dir
        "sequence_length": 8,
        "batch_size": 16,
        "seed": 0,
    },
    "train": {
        "steps": 1000,
        "lr": 2e-4,
        "weight_decay": 1e-4,
        "strategy": "fsdp",
        "checkpoint_dir": None,
        "checkpoint_every": None,
        "log_dir": None,
        "log_interval": 10,
    },
}


def build_audio_transform(cfg: Dict[str, Any]) -> Callable[[np.ndarray], np.ndarray]:
    """(samples, channels) waveform -> (frames, melbins, 1) fbank image."""
    m, d = cfg["model"], cfg["data"]
    fbank = AudioPretrainTransform(
        melbins=m["melbins"], target_length=m["target_length"],
        rng=np.random.RandomState(d["seed"]),
    )

    def transform(audio: np.ndarray) -> np.ndarray:
        mono = np.asarray(audio, np.float32).mean(axis=-1)
        return fbank([mono], sample_rate=AUDIO_SAMPLE_RATE)[0]

    return transform


def build_datamodule(cfg: Dict[str, Any], split: str = "train") -> MUGENDataModule:
    d = cfg["data"]
    return MUGENDataModule(
        d["path"],
        d["frames_dir"],
        split=split,
        sequence_length=d["sequence_length"],
        get_audio=True,
        audio_dir=d["audio_dir"],
        audio_transform=build_audio_transform(cfg),
        batch_size=d["batch_size"],
        shuffle=split == "train",
        drop_last=split == "train",
        seed=d["seed"],
    )


def build_model(cfg: Dict[str, Any]):
    m = cfg["model"]
    size_kwargs = {
        "small": dict(encoder_layers=12, encoder_hidden_dim=384,
                      encoder_heads=6, encoder_dim_feedforward=1536),
        "base": {},
    }[m["size"]]
    return audio_mae(
        input_size=(m["target_length"], m["melbins"]),
        masking_ratio=m["masking_ratio"],
        dtype=jnp.bfloat16 if m["bf16"] else jnp.float32,
        **size_kwargs,
    )


def build_trainer_and_state(cfg: Dict[str, Any]):
    import optax

    from multimodal_tpu.modules.losses.reconstruction_loss import (
        reconstruction_loss,
    )
    from multimodal_tpu.parallel.mesh import create_mesh
    from multimodal_tpu.training.trainer import Trainer

    m, t = cfg["model"], cfg["train"]
    model = build_model(cfg)

    def loss_fn(params, batch, rng):
        out = model.apply(
            params, batch["audio"], deterministic=False,
            rngs={"patch_drop": rng, "dropout": rng},
        )
        loss = reconstruction_loss(
            out.decoder_pred, out.label_patches, out.mask,
            normalize_target=True,
        )
        return loss, {}

    trainer = Trainer(
        loss_fn,
        optax.adamw(t["lr"], weight_decay=t["weight_decay"]),
        strategy=t["strategy"],
        mesh=create_mesh(dp=1, fsdp=-1, tp=1),
        checkpoint_dir=t["checkpoint_dir"],
        log_dir=t["log_dir"],
        log_interval=t["log_interval"],
    )
    sample = jnp.zeros((1, m["target_length"], m["melbins"], 1), jnp.float32)
    params = jax.jit(lambda r: model.init(
        {"params": r, "patch_drop": jax.random.PRNGKey(1)},
        sample, deterministic=False,
    ))(jax.random.PRNGKey(0))
    state = trainer.restore_or_init(params)
    return model, trainer, state


def main(argv=None):
    parser = argparse.ArgumentParser(description="AudioMAE pretraining on MUGEN audio")
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("overrides", nargs="*", help="dotlist overrides a.b=c")
    args = parser.parse_args(argv)
    cfg = build_config(args.config, args.overrides, defaults=DEFAULTS)
    if not cfg["data"]["path"] or not cfg["data"]["frames_dir"]:
        raise SystemExit("set data.path=<release json dir> data.frames_dir=<npy dir>")

    model, trainer, state = build_trainer_and_state(cfg)
    state = trainer.fit(
        state,
        build_datamodule(cfg).train_batches(),
        num_steps=cfg["train"]["steps"],
        checkpoint_every=cfg["train"]["checkpoint_every"],
    )
    print(f"finished at step {int(state['step'])}", flush=True)
    return state


if __name__ == "__main__":
    main()
