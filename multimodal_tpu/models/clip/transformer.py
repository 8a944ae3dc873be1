"""CLIP's pre-norm transformer stack.

Replicates the numerics of the torch ``nn.TransformerEncoderLayer``
(norm_first=True, quick-GELU activation, LN eps 1e-5) that the reference
CLIP encoders instantiate (``models/clip/image_encoder.py:66-78``,
``models/clip/text_encoder.py:59-68``), so converted pretrained weights
reproduce reference outputs. TPU-native: fused QKV matmul + the shared
attention dispatch (Pallas flash on long sequences).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.activation import quick_gelu
from multimodal_tpu.modules.layers.dense_params import (
    DenseParams,
    dense_apply,
    dense_interception_active,
)
from multimodal_tpu.ops.attention import scaled_dot_product_attention
from multimodal_tpu.ops.fused_encoder import (
    fused_encoder_available,
    fused_mlp,
    fused_qkv_attention,
)


class CLIPEncoderLayer(nn.Module):
    width: int
    heads: int
    dim_feedforward: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, is_causal: bool = False) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name=name
        )
        dense = lambda d, name: nn.Dense(
            d, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        b, s, e = x.shape
        h = self.heads
        # Pallas fused-encoder kernels on TPU at short sequence: attention
        # consumes the qkv buffer directly (no split/transpose copies, no
        # HBM scores) and the MLP keeps its d_ff intermediate in VMEM —
        # the byte-ledger fix for the HBM-bound encoder (ops/fused_encoder)
        fused = fused_encoder_available(s, e, h)

        # Self-attention (pre-norm)
        y = ln("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        qkv = dense(3 * e, "in_proj")(y)
        if fused:
            attn = fused_qkv_attention(qkv, h, is_causal)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            to_heads = lambda t: t.reshape(b, s, h, e // h).transpose(0, 2, 1, 3)
            attn = scaled_dot_product_attention(
                to_heads(q), to_heads(k), to_heads(v), is_causal=is_causal
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(b, s, e)
        x = x + dense(e, "out_proj")(attn)

        # MLP (pre-norm)
        y = ln("norm2")(x.astype(jnp.float32)).astype(self.dtype)
        if dense_interception_active():
            # interceptor hooks (multi-LoRA serving) need module-boundary
            # Dense calls; same param names as the DenseParams fast path
            h_mid = quick_gelu(dense(self.dim_feedforward, "linear1")(y))
            return x + dense(e, "linear2")(h_mid)
        w1, b1 = DenseParams(
            self.dim_feedforward, param_dtype=self.param_dtype, name="linear1"
        )(e)
        w2, b2 = DenseParams(e, param_dtype=self.param_dtype, name="linear2")(
            self.dim_feedforward
        )
        if fused:
            x = x + fused_mlp(
                y.astype(self.dtype), w1.astype(self.dtype),
                b1.astype(self.dtype), w2.astype(self.dtype),
                b2.astype(self.dtype), "quick_gelu",
            )
        else:
            y = quick_gelu(dense_apply(y, w1, b1, self.dtype))
            x = x + dense_apply(y, w2, b2, self.dtype)
        return x


class CLIPTransformer(nn.Module):
    width: int
    heads: int
    layers: int
    dim_feedforward: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, is_causal: bool = False) -> jnp.ndarray:
        ff = self.dim_feedforward or 4 * self.width
        for i in range(self.layers):
            x = CLIPEncoderLayer(
                self.width, self.heads, ff,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"layer_{i}",
            )(x, is_causal=is_causal)
        return x
