"""Trainer / multidata / checkpoint / zero-shot tests on the 8-device mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.training.multidata import (
    MultiDataLoader,
    make_weighted_sampling,
    round_robin_sampling,
)
from multimodal_tpu.training.trainer import Trainer
from multimodal_tpu.training.zero_shot import (
    build_zero_shot_classifier,
    zero_shot_accuracy,
)

from tests.test_utils import assert_expected, rng


def test_multidata_round_robin_and_reignite():
    loaders = {"a": [1, 2], "b": [10, 20, 30]}
    mdl = MultiDataLoader(loaders)
    it = iter(mdl)
    got = [next(it) for _ in range(6)]
    names = [g[0] for g in got]
    assert names == ["a", "b", "a", "b", "a", "b"]
    # 'a' exhausted after 2 draws and re-ignited
    assert [g[1] for g in got if g[0] == "a"] == [1, 2, 1]


def test_multidata_weighted_deterministic():
    sampling = make_weighted_sampling([0.8, 0.2])
    seq1 = [sampling(i, 2, seed=7) for i in range(50)]
    seq2 = [sampling(i, 2, seed=7) for i in range(50)]
    assert seq1 == seq2  # same on every "host"
    assert seq1.count(0) > seq1.count(1)


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(4)(nn.relu(nn.Dense(32)(x)))


def _make_data(n_batches, batch=16):
    r = np.random.RandomState(0)
    w = r.randn(8, 4).astype(np.float32)
    for _ in range(n_batches):
        x = r.randn(batch, 8).astype(np.float32)
        y = x @ w
        yield {"x": x, "y": y}


def test_trainer_fsdp_fit_and_checkpoint(tmp_path):
    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    model = TinyModel()
    params = model.init(rng(0), jnp.zeros((1, 8)))

    def loss_fn(params, batch, _rng):
        pred = model.apply(params, batch["x"])
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"mse": loss}

    trainer = Trainer(
        loss_fn, optax.adam(1e-2), strategy="fsdp", mesh=mesh,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        log_interval=100,
    )
    state = trainer.restore_or_init(params)
    state = trainer.fit(state, _make_data(30), num_steps=30, checkpoint_every=10)
    assert int(state["step"]) == 30
    assert os.path.exists(tmp_path / "logs" / "metrics.jsonl")

    # resume from checkpoint
    trainer2 = Trainer(
        loss_fn, optax.adam(1e-2), strategy="fsdp", mesh=mesh,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    state2 = trainer2.restore_or_init(params)
    assert int(state2["step"]) == 30

    # loss decreased during training
    import json

    records = [json.loads(l) for l in open(tmp_path / "logs" / "metrics.jsonl")]
    assert records[-1]["loss"] < records[0]["loss"]


def test_trainer_ddp_strategy():
    mesh = create_mesh(dp=-1, fsdp=1, tp=1)
    model = TinyModel()
    params = model.init(rng(0), jnp.zeros((1, 8)))

    def loss_fn(params, batch, _rng):
        pred = model.apply(params, batch["x"])
        return jnp.mean((pred - batch["y"]) ** 2), {}

    trainer = Trainer(loss_fn, optax.sgd(1e-2), strategy="ddp", mesh=mesh)
    state = trainer.init_state(params)
    state = trainer.fit(state, _make_data(5), num_steps=5)
    assert int(state["step"]) == 5


def test_zero_shot_eval():
    d = 16
    r = np.random.RandomState(0)
    class_dirs = r.randn(3, d).astype(np.float32)

    names = ["cat", "dog", "car"]

    def tokenize(prompts):
        # fake tokens: class index parsed from the prompt text
        return np.array([next(i for i, n in enumerate(names) if n in p) for p in prompts])

    def encode_text(tokens):
        return jnp.asarray(class_dirs[tokens] + 0.01 * r.randn(len(tokens), d))

    classifier = build_zero_shot_classifier(
        encode_text, tokenize, names, templates=("a photo of a {}.",)
    )
    assert classifier.shape == (d, 3)

    # images exactly on class directions are classified correctly
    img = jnp.asarray(class_dirs)
    acc = zero_shot_accuracy(img, jnp.arange(3), classifier)
    assert acc["top1"] == 1.0


def test_resume_then_train_and_exact_data_fast_forward(tmp_path):
    """Interrupted(3)+resumed(2) training == uninterrupted(5), bit-exact.

    Covers two failure modes at once: (1) orbax-restored scalars come back
    committed to device 0 and must be re-placed on the mesh before the
    jitted step accepts them (restore_or_init re-sharding); (2) the data
    stream must fast-forward to the checkpointed step exactly
    (DataModule.train_batches(start_step=...), per-batch rng)."""
    from multimodal_tpu.data.datamodules import DataModule

    class ResumeDM(DataModule):
        def process(self, sample, rng):
            x = np.asarray(sample, np.float32) + rng.rand(8).astype(np.float32)
            return {"x": x, "y": x * 2.0}

    def make_dm():
        return ResumeDM(
            [np.full(8, i, np.float32) for i in range(64)],
            batch_size=16, seed=7, prefetch=0,
        )

    class Net8(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8)(nn.relu(nn.Dense(16)(x)))

    model = Net8()

    def loss_fn(params, batch, _rng):
        pred = model.apply(params, batch["x"])
        return jnp.mean((pred - batch["y"]) ** 2), {}

    def run(tag, steps_list):
        mesh = create_mesh(dp=2, fsdp=4, tp=1)
        for steps in steps_list:
            trainer = Trainer(
                loss_fn, optax.adam(1e-2), strategy="fsdp", mesh=mesh,
                checkpoint_dir=str(tmp_path / tag),
            )
            params = model.init(rng(0), jnp.zeros((1, 8)))
            state = trainer.restore_or_init(params)
            data = make_dm().train_batches(start_step=int(state["step"]))
            state = trainer.fit(state, data, num_steps=steps,
                                checkpoint_every=steps)
        return state

    full = run("full", [5])
    resumed = run("resumed", [3, 2])
    assert int(resumed["step"]) == 5
    for a, b in zip(
        jax.tree_util.tree_leaves(full["params"]),
        jax.tree_util.tree_leaves(resumed["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
