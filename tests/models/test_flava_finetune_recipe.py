"""FLAVA classification fine-tune recipe: builds and takes one step."""

import pytest
from multimodal_tpu.examples.flava.finetune import (
    DEFAULTS,
    build_trainer_and_state,
    synthetic_batches,
)
from multimodal_tpu.utils.config import apply_dotlist

TINY_OVERRIDES = (
    "model.image_size=32", "model.patch_size=8", "model.vocab_size=500",
    "model.overrides={image_hidden_size: 32, image_num_hidden_layers: 1, "
    "image_num_attention_heads: 2, image_intermediate_size: 64, "
    "text_hidden_size: 32, text_num_hidden_layers: 1, "
    "text_num_attention_heads: 2, text_intermediate_size: 64, "
    "multimodal_hidden_size: 32, multimodal_num_hidden_layers: 1, "
    "multimodal_num_attention_heads: 2, multimodal_intermediate_size: 64, "
    "text_and_image_proj_size: 24, max_position_embeddings: 80}",
    "data.batch_size=8", "data.text_len=16",
)


@pytest.mark.slow
def test_flava_finetune_one_step():
    cfg = apply_dotlist({k: dict(v) for k, v in DEFAULTS.items()}, TINY_OVERRIDES)
    trainer, state = build_trainer_and_state(cfg)
    state = trainer.fit(state, synthetic_batches(cfg), num_steps=1)
    assert int(state["step"]) == 1
