"""MoE as a multimodal-flagship capability (VERDICT r3 item 5): the FLAVA
towers expose ``moe_num_experts / moe_interval / moe_top_k / ep_axis_name``
(``models/flava/configs.py`` ``base-moe-8e``), the pretrain recipe trains on
a dp x ep mesh with the router aux losses joining the objective, and a
single-expert MoE FLAVA reproduces the dense model exactly.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.flava.configs import FLAVA_CONFIGS
from multimodal_tpu.models.flava.model import flava_model
from multimodal_tpu.utils.config import build_config

from multimodal_tpu.examples.flava.pretrain import (
    DEFAULTS,
    build_trainer_and_state,
    synthetic_batches,
)

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "..",
    "multimodal_tpu", "examples", "flava", "configs", "debug.yaml",
)

TINY = dict(
    image_hidden_size=32, image_num_hidden_layers=2,
    image_num_attention_heads=2, image_intermediate_size=64,
    text_hidden_size=32, text_num_hidden_layers=2,
    text_num_attention_heads=2, text_intermediate_size=64,
    multimodal_hidden_size=32, multimodal_num_hidden_layers=2,
    multimodal_num_attention_heads=2, multimodal_intermediate_size=64,
    text_and_image_proj_size=24, max_position_embeddings=32,
    image_size=32, patch_size=8, vocab_size=200,
)


def test_flava_moe_config_exposes_expert_params():
    """base-moe-8e puts expert tensors (leading expert dim) in all three
    towers; interval 2 -> every 2nd layer of each 2-layer tiny tower."""
    model = flava_model(**TINY, **FLAVA_CONFIGS["base-moe-8e"])
    params = model.init(
        jax.random.PRNGKey(0),
        image=jnp.zeros((1, 32, 32, 3)),
        text=jnp.ones((1, 16), jnp.int32),
        skip_unmasked_mm_encoder=False,
    )
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    expert_tensors = {k: v for k, v in flat.items() if k.endswith("/wi")}
    towers = {k.split("/")[1] for k in expert_tensors}
    assert {"image_encoder", "text_encoder", "mm_encoder"} <= towers, towers
    for k, v in expert_tensors.items():
        assert v.shape[0] == 8, f"{k}: {v.shape}"


def _moe_params_from_dense(dense, moe):
    """Fill a single-expert MoE param tree from a dense FLAVA's params: the
    lone expert gets the dense MLP weights, the router becomes irrelevant
    (softmax over one expert is 1)."""
    def rec(d, m):
        out = {}
        for k, mv in m.items():
            if (
                k == "feedforward"
                and isinstance(mv, dict)
                and "router" in mv
            ):
                dv = d[k]
                out[k] = {
                    "router": {
                        "kernel": jnp.zeros_like(mv["router"]["kernel"])
                    },
                    "wi": dv["hidden_0"]["kernel"][None],
                    "bi": dv["hidden_0"]["bias"][None],
                    "wo": dv["out"]["kernel"][None],
                    "bo": dv["out"]["bias"][None],
                }
            elif isinstance(mv, dict):
                out[k] = rec(d[k], mv)
            else:
                out[k] = d[k]
        return out

    return rec(dense, moe)


def test_flava_moe_single_expert_matches_dense():
    dense = flava_model(**TINY)
    moe = flava_model(
        **TINY, moe_num_experts=1, moe_top_k=1, moe_interval=2,
        moe_capacity_factor=4.0,
    )
    image = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    text = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 1, 200)

    dense_params = dense.init(
        jax.random.PRNGKey(0), image=image, text=text,
        skip_unmasked_mm_encoder=False,
    )
    moe_template = moe.init(
        jax.random.PRNGKey(0), image=image, text=text,
        skip_unmasked_mm_encoder=False,
    )
    moe_params = _moe_params_from_dense(dense_params, moe_template)

    out_d = dense.apply(dense_params, image=image, text=text,
                        skip_unmasked_mm_encoder=False)
    out_m = moe.apply(moe_params, image=image, text=text,
                      skip_unmasked_mm_encoder=False)
    np.testing.assert_allclose(
        np.asarray(out_m.projected_image_embeddings),
        np.asarray(out_d.projected_image_embeddings), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_m.projected_text_embeddings),
        np.asarray(out_d.projected_text_embeddings), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_m.multimodal.last_hidden_state),
        np.asarray(out_d.multimodal.last_hidden_state), atol=1e-5,
    )


@pytest.mark.slow
def test_flava_moe_recipe_trains_dp_ep(tmp_path):
    """MoE-FLAVA (base-moe-8e knobs at debug scale) trains 2 Trainer.fit
    steps from the recipe on a dp=2 x ep=4 mesh; moe_aux is logged and
    finite, and expert tensors actually carry the ep axis."""
    cfg = build_config(
        CONFIG,
        overrides=[
            "model.size=base-moe-8e",
            "train.steps=2",
            "train.ep=4",
            f"train.log_dir={tmp_path}",
        ],
        defaults=DEFAULTS,
    )
    trainer, state = build_trainer_and_state(cfg)

    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(lambda l: l.sharding, state["params"])
        )[0]
    }
    n_ep = sum(
        1 for k, s in flat.items()
        if k.endswith(("/wi", "/wo")) and any(
            e == "ep" for e in s.spec
            if e is not None and not isinstance(e, tuple)
        )
    )
    assert n_ep >= 6, f"only {n_ep} expert tensors on ep"

    state = trainer.fit(state, synthetic_batches(cfg), num_steps=2)
    assert int(state["step"]) == 2
    records = [
        json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(records) == 2
    assert "moe_aux" in records[0], records[0].keys()
    assert np.isfinite(records[0]["moe_aux"]) and records[0]["moe_aux"] > 0
    assert np.isfinite(records[0]["loss"])
