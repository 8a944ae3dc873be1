"""DALL-E dVAE encoder (frozen codebook for FLAVA MIM labels).

Parity with reference ``models/flava/model.py`` (DalleConv2d:596,
DalleEncoderBlock:615, DalleEncoder:639, DalleVAEEncoder:716). NHWC layout;
the weight converter maps OpenAI's ``encoder.pkl`` state dict. Used frozen
(``jax.lax.stop_gradient`` at the call site) — it only produces MIM labels.
"""

from __future__ import annotations

import math
from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


class DalleConv2d(nn.Module):
    n_out: int
    kw: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_in = x.shape[-1]
        return nn.Conv(
            self.n_out,
            kernel_size=(self.kw, self.kw),
            padding=(self.kw - 1) // 2,
            kernel_init=nn.initializers.normal(1 / math.sqrt(n_in * self.kw ** 2)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class DalleEncoderBlock(nn.Module):
    n_out: int
    n_layers: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_hid = self.n_out // 4
        post_gain = 1 / (self.n_layers ** 2)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        identity = x
        if x.shape[-1] != self.n_out:
            identity = DalleConv2d(self.n_out, 1, name="id_path", **kw)(x)
        h = DalleConv2d(n_hid, 3, name="conv_1", **kw)(jax.nn.relu(x))
        h = DalleConv2d(n_hid, 3, name="conv_2", **kw)(jax.nn.relu(h))
        h = DalleConv2d(n_hid, 3, name="conv_3", **kw)(jax.nn.relu(h))
        h = DalleConv2d(self.n_out, 1, name="conv_4", **kw)(jax.nn.relu(h))
        return identity + post_gain * h


class DalleEncoder(nn.Module):
    group_count: int = 4
    n_hid: int = 256
    n_blk_per_group: int = 2
    input_channels: int = 3
    vocab_size: int = 8192
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, h, w, 3) NHWC -> logits (b, h//8, w//8, vocab)."""
        if x.shape[-1] != self.input_channels:
            raise ValueError(
                f"input has {x.shape[-1]} channels but model built for {self.input_channels}"
            )
        n_layers = self.group_count * self.n_blk_per_group
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = DalleConv2d(self.n_hid, 7, name="input_conv", **kw)(x.astype(self.dtype))
        widths = [1, 2, 4, 8]
        for gi, mult in enumerate(widths):
            for bi in range(self.n_blk_per_group):
                h = DalleEncoderBlock(
                    mult * self.n_hid, n_layers,
                    name=f"group_{gi + 1}_block_{bi + 1}", **kw,
                )(h)
            if gi < len(widths) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return DalleConv2d(self.vocab_size, 1, name="output_conv", **kw)(jax.nn.relu(h))


class DalleVAEEncoder(nn.Module):
    """Frozen dVAE -> codebook indices for MIM labels (reference :716)."""

    image_size: Union[int, Tuple[int, int]] = 112
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = DalleEncoder(dtype=self.dtype, param_dtype=self.param_dtype)

    def get_codebook_indices(self, images: jnp.ndarray) -> jnp.ndarray:
        z_logits = self.encoder(images)
        return jnp.argmax(z_logits, axis=-1)

    def get_codebook_probs(self, images: jnp.ndarray) -> jnp.ndarray:
        z_logits = self.encoder(images)
        return jax.nn.softmax(z_logits, axis=-1)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.get_codebook_indices(images)
