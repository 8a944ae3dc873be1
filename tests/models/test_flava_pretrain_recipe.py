"""FLAVA pretrain recipe: config plumbing + a real 2-step fit."""

import pytest
import os

from multimodal_tpu.examples.flava.pretrain import (
    DEFAULTS,
    build_trainer_and_state,
    synthetic_batches,
)
from multimodal_tpu.utils.config import build_config

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "..",
    "multimodal_tpu", "examples", "flava", "configs", "debug.yaml",
)


@pytest.mark.slow
def test_flava_pretrain_recipe_two_steps(tmp_path):
    cfg = build_config(
        CONFIG,
        overrides=["train.steps=2", f"train.log_dir={tmp_path}"],
        defaults=DEFAULTS,
    )
    trainer, state = build_trainer_and_state(cfg)
    state = trainer.fit(state, synthetic_batches(cfg), num_steps=2)
    assert int(state["step"]) == 2
    metrics = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) == 2 and "loss" in metrics[0]
