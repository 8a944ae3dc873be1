"""Pure-bf16 FLAVA pretraining (train.pure_bf16): bf16 params +
AnyPrecision Kahan optimizer (8 bytes/param persistent state) — the
envelope that fits 900m on one v5e chip and 10b on a v5e-16 pod
(BENCHMARKS.md "10B envelope"). Composes with scan_layers towers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

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


def test_pure_bf16_scan_recipe_trains(tmp_path):
    cfg = build_config(
        CONFIG,
        overrides=[
            "train.steps=2",
            "train.pure_bf16=true",
            f"train.log_dir={tmp_path}",
        ],
        defaults=DEFAULTS,
    )
    cfg["model"]["overrides"]["scan_layers"] = True
    trainer, state = build_trainer_and_state(cfg)

    # params are bf16 end to end (the scalar logit_scale deliberately stays
    # fp32 — its [ln 1, ln 100] clamp needs more than bf16's 8 mantissa
    # bits, and a scalar costs nothing); towers are scan-stacked
    fp32_leaves = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, l in jax.tree_util.tree_flatten_with_path(state["params"])[0]
        if l.dtype != jnp.bfloat16
    ]
    assert fp32_leaves == ["params/loss/contrastive_loss/logit_scale"], fp32_leaves
    flat = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(state["params"])[0]
    ]
    assert any("layers/layer" in p for p in flat), "towers are not scanned"
    assert not any("layer_0" in p for p in flat)

    # AnyPrecision state: bf16 momentum/variance + Kahan compensation
    opt = state["opt_state"]
    assert opt.compensation is not None
    for tree in (opt.momentum, opt.variance, opt.compensation):
        for l in jax.tree_util.tree_leaves(tree):
            assert l.dtype == jnp.bfloat16

    state = trainer.fit(state, synthetic_batches(cfg), num_steps=2)
    assert int(state["step"]) == 2
    records = [
        json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(records) == 2 and np.isfinite(records[0]["loss"])
    # params moved (the Kahan update actually applies at bf16)
    assert records[0]["loss"] != records[1]["loss"]
