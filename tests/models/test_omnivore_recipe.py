"""Omnivore multi-task recipe: modality round-robin + shape-dispatched heads."""

import pytest
from multimodal_tpu.examples.omnivore.train import (
    DEFAULTS,
    build_trainer_and_state,
    input_type_of,
    synthetic_loaders,
)
from multimodal_tpu.training.multidata import MultiDataLoader
from multimodal_tpu.utils.config import apply_dotlist

import jax.numpy as jnp


def test_input_type_inference():
    assert input_type_of(jnp.zeros((2, 1, 8, 8, 3))) == "image"
    assert input_type_of(jnp.zeros((2, 4, 8, 8, 3))) == "video"
    assert input_type_of(jnp.zeros((2, 1, 8, 8, 4))) == "rgbd"


@pytest.mark.slow
def test_omnivore_multitask_three_steps(tmp_path):
    cfg = apply_dotlist(
        {k: dict(v) for k, v in DEFAULTS.items()},
        ["model.embed_dim=16", "model.depths=[1]", "model.heads=[2]",
         "data.batch_size=8", "data.image_size=16", "data.video_frames=2",
         f"train.log_dir={tmp_path}"],
    )
    trainer, state, loaders = build_trainer_and_state(cfg)
    data = MultiDataLoader(loaders, seed=0)
    state = trainer.fit(state, data, num_steps=3)
    assert int(state["step"]) == 3
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    # one step per modality in round-robin order
    assert "image_loss" in lines[0] and "video_loss" in lines[1] and "rgbd_loss" in lines[2]
