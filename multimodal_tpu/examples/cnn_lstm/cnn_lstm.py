"""Toy CNN+LSTM late-fusion classifier.

Parity with reference ``examples/cnn_lstm/`` (223 LoC): a small CNN image
encoder + LSTM text encoder fused by concatenation into a classifier head,
assembled with the generic ``LateFusion`` architecture.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.late_fusion import LateFusion
from multimodal_tpu.modules.fusions.concat_fusion import ConcatFusionModule
from multimodal_tpu.modules.layers.mlp import MLP


class CNNEncoder(nn.Module):
    """Conv stack -> flatten -> dense (NHWC input)."""

    out_dim: int = 64
    channels: Any = (16, 32, 64)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), strides=2, padding=1, name=f"conv{i}")(x)
            x = jax.nn.relu(nn.GroupNorm(num_groups=4, name=f"gn{i}")(x))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_dim, name="proj")(x)


class LSTMEncoder(nn.Module):
    """Embedding -> LSTM -> last hidden state."""

    vocab_size: int = 1000
    embed_dim: int = 32
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")(tokens)
        lstm = nn.RNN(nn.LSTMCell(self.hidden_dim), name="lstm")
        out = lstm(emb)
        return out[:, -1]


def cnn_lstm_classifier(
    num_classes: int = 2,
    cnn_out_dim: int = 64,
    lstm_hidden: int = 64,
    vocab_size: int = 1000,
) -> LateFusion:
    return LateFusion(
        encoders={
            "image": CNNEncoder(out_dim=cnn_out_dim),
            "text": LSTMEncoder(vocab_size=vocab_size, hidden_dim=lstm_hidden),
        },
        fusion_module=ConcatFusionModule(),
        head_module=MLP(cnn_out_dim + lstm_hidden, num_classes, [64], dropout=0.0),
    )
