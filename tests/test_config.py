"""Config layer: YAML load, dotlist merge, _target_ instantiation."""

import jax.numpy as jnp

from multimodal_tpu.utils.config import (
    apply_dotlist,
    build_config,
    instantiate,
    merge,
)


def test_merge_and_dotlist(tmp_path):
    yaml_file = tmp_path / "c.yaml"
    yaml_file.write_text("model:\n  dim: 32\n  layers: 2\ntrain:\n  lr: 1.0e-3\n")
    cfg = build_config(
        str(yaml_file),
        overrides=["model.dim=64", "train.steps=100", "train.lr=5e-4"],
        defaults={"train": {"lr": 1e-2, "wd": 0.1}, "seed": 0},
    )
    assert cfg["model"] == {"dim": 64, "layers": 2}
    assert cfg["train"]["lr"] == 5e-4          # dotlist beats yaml beats default
    assert cfg["train"]["wd"] == 0.1           # default preserved
    assert cfg["train"]["steps"] == 100        # dotlist can add new keys
    assert cfg["seed"] == 0

    deep = merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}})
    assert deep == {"a": {"b": 9, "c": 2}}

    typed = apply_dotlist({}, ["x=true", "y=[1, 2]", "z=null", "s=hello"])
    assert typed == {"x": True, "y": [1, 2], "z": None, "s": "hello"}


def test_instantiate_nested():
    cfg = {
        "_target_": "multimodal_tpu.models.clip.model.clip_vit_b32",
    }
    model = instantiate(cfg)
    from multimodal_tpu.models.clip.model import CLIP

    assert isinstance(model, CLIP)

    # nested targets: optimizer built from config with override kwarg
    opt_cfg = {"_target_": "optax.adamw", "learning_rate": 1e-3}
    import optax

    opt = instantiate(opt_cfg, weight_decay=0.05)
    assert isinstance(opt, optax.GradientTransformation)
