"""Convergence smoke (VERDICT r2 item 9): nothing before round 3 ever
showed a loss *curve*. Train a tiny CLIP contrastively on a small ON-DISK
image-caption dataset for ~150 steps with checkpoint-resume mid-run, and
the MUGEN-style GPT on structured token streams, asserting the final loss
beats the initial by a clear margin (learnable structure, not noise)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.training.trainer import Trainer


def _write_clip_dataset(tmp_path, n_classes=8, per_class=4):
    """Images whose dominant color encodes the class; captions name it —
    a learnable image-text correspondence."""
    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    path = tmp_path / "train.jsonl"
    colors = rng.randint(40, 220, size=(n_classes, 3))
    with open(path, "w") as f:
        for c in range(n_classes):
            for i in range(per_class):
                img = np.clip(
                    colors[c][None, None, :]
                    + rng.randint(-20, 20, (32, 32, 3)), 0, 255
                ).astype(np.uint8)
                p = img_dir / f"{c}_{i}.png"
                Image.fromarray(img).save(p)
                f.write(json.dumps(
                    {"image": str(p), "text": f"an object of kind {c}"}
                ) + "\n")
    return str(path)


@pytest.mark.slow
def test_tiny_clip_convergence_with_resume(tmp_path):
    from multimodal_tpu.data.datasets import load_dataset
    from multimodal_tpu.models.clip.image_encoder import CLIPViTEncoder
    from multimodal_tpu.models.clip.model import CLIP
    from multimodal_tpu.models.clip.text_encoder import CLIPTextEncoder
    from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
        contrastive_loss_with_temperature,
    )

    data_path = _write_clip_dataset(tmp_path)
    dataset = load_dataset(data_path, split="train")

    def tokenize(text):
        # keep the TAIL of the caption — that's where the class digit lives
        ids = [1] + [10 + ord(ch) % 80 for ch in text[-14:]] + [2]
        return np.pad(ids, (0, 16 - len(ids))).astype(np.int32)

    def batches(seed=0, batch=8):
        rng = np.random.RandomState(seed)
        while True:
            idx = rng.randint(len(dataset), size=batch)
            imgs, txts = [], []
            for i in idx:
                s = dataset[int(i)]
                from PIL import Image

                img = np.asarray(Image.open(s["image"]), np.float32) / 255.0
                imgs.append(img)
                txts.append(tokenize(s["text"]))
            yield {"image": np.stack(imgs), "text": np.stack(txts)}

    model = CLIP(
        CLIPViTEncoder(embedding_dim=32, patch_size=8, image_size=32,
                       width=64, heads=2, layers=2),
        CLIPTextEncoder(embedding_dim=32, context_length=16, vocab_size=128,
                        width=64, dim_feedforward=128, heads=2, layers=2),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16), jnp.int32),
    )

    def loss_fn(params, batch, _rng):
        out = model.apply(params, batch["image"], batch["text"])
        loss = contrastive_loss_with_temperature(
            out.embeddings_a, out.embeddings_b, jnp.float32(np.log(1 / 0.07))
        ).loss
        return loss, {}

    mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])

    def make_trainer():
        return Trainer(
            loss_fn, optax.adamw(2e-3), strategy="ddp", mesh=mesh,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "logs"), log_interval=1000,
        )

    trainer = make_trainer()
    state = trainer.restore_or_init(params)
    state = trainer.fit(state, batches(), num_steps=75, checkpoint_every=75)

    # resume from the checkpoint with a FRESH trainer (mid-run restart)
    trainer2 = make_trainer()
    state2 = trainer2.restore_or_init(params)
    assert int(state2["step"]) == 75, "checkpoint-resume failed"
    state2 = trainer2.fit(state2, batches(seed=1), num_steps=75)
    assert int(state2["step"]) == 150

    records = [
        json.loads(l)
        for l in (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [r["loss"] for r in records]
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(last)
    # a real learning curve: > 40% loss reduction over 150 steps
    assert last < 0.6 * first, f"no convergence: {first:.3f} -> {last:.3f}"


@pytest.mark.slow
def test_tiny_gpt_convergence(tmp_path):
    """The long-context GPT learns a deterministic token pattern."""
    from multimodal_tpu.examples.long_context.model import (
        LongContextLM,
        next_token_loss,
    )

    # periodic token stream -> next-token entropy is ~0 for a working LM
    pattern = np.tile(np.arange(12, dtype=np.int32) + 3, 600)
    model = LongContextLM(vocab_size=32, max_seq_len=48, n_layer=2,
                          d_model=48, n_head=2, dim_feedforward=96)
    tokens0 = jnp.zeros((1, 48), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens0)
    tx = optax.adamw(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, tokens):
        def lf(p):
            logits = model.apply(p, tokens[:, :-1])
            return next_token_loss(logits, tokens[:, 1:])

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.RandomState(0)
    losses = []
    for i in range(120):
        start = rng.randint(0, len(pattern) - 50, size=4)
        batch = np.stack([pattern[s:s + 49] for s in start])
        params, opt, loss = step(params, opt, jnp.asarray(batch))
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.3 * np.mean(losses[:5]), (
        f"no convergence: {np.mean(losses[:5]):.3f} -> {np.mean(losses[-10:]):.3f}"
    )
