"""Quantized KV-cache storage format.

Autoregressive decode at batch is KV-read-bound: every tick reads the full
cached prefix (BENCHMARKS.md, decode section — step time tracks KV bytes).
Storing keys/values as int8 with per-position, per-head scales halves that
traffic vs bf16 (4x vs fp32) and doubles the context a chip can hold.

``QuantizedKV`` is a pytree (flax struct), so a quantized cache scans,
donates, and shards exactly like a dense one. Quantization happens at WRITE
time (each position's k/v row is scaled once, when it enters the cache);
the read side dequantizes inside the attention computation, where XLA fuses
the upcast into the score matmul's operand read. Scales are per
``(batch, head, position)`` over the head dim — attention's dot products
then see at most the rounding error of a 127-level grid per row, ~0.4%
relative, far below sampling noise (tests assert greedy-token equality on
the toy models and logit closeness elsewhere).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class QuantizedKV:
    """int8 cache tensor + fp32 per-position scales.

    ``q``: int8, ``(..., positions, head_dim)``;
    ``scale``: fp32, ``(..., positions)`` — ``dense ~= q * scale[..., None]``.
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        return (
            self.q.astype(jnp.float32) * self.scale[..., None]
        ).astype(dtype)


def quantize_kv(x: jnp.ndarray):
    """Per-position symmetric int8 over the trailing head dim:
    returns ``(q int8, scale fp32)`` with ``x ~= q * scale[..., None]``."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantized_kv_zeros(shape) -> QuantizedKV:
    """Empty quantized cache buffer of dense-equivalent ``shape``
    ``(..., positions, head_dim)``."""
    return QuantizedKV(
        q=jnp.zeros(shape, jnp.int8),
        scale=jnp.zeros(shape[:-1], jnp.float32),
    )


def is_quantized_kv(x) -> bool:
    return isinstance(x, QuantizedKV)
