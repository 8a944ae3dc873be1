"""Generalized n-dimensional attention (video/image latents).

Parity with reference ``modules/layers/attention.py`` (SelfAttention:15,
MultiHeadAttention:70, scaled_dot_product_attention:185,
split_multihead:244, merge_multihead:253) and the axial attention of
``models/video_gpt/video_vqvae.py:21-139`` (AxialAttention,
AxialAttentionBlock).

Inputs are ``(b, d1, ..., dn, dim)`` (channel-last); latent dims are
flattened to a sequence before the fused attention op. KV caches are
explicit pytrees threaded by the caller.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.ops.attention import scaled_dot_product_attention as _sdpa
from multimodal_tpu.ops.kv_cache import is_quantized_kv


def split_multihead(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(b, seq, dim) -> (b, heads, seq, dim // heads)."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_multihead(x: jnp.ndarray) -> jnp.ndarray:
    """(b, heads, seq, head_dim) -> (b, seq, dim)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    head_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit-softmax attention returning (output, probs).

    Mirrors reference ``attention.py:185-241``: boolean ``attention_mask``
    (True = attend) and multiplicative ``head_mask`` applied to the probs.
    """
    attn = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    attn = attn / (q.shape[-1] ** 0.5)
    if attention_mask is not None:
        attn = jnp.where(attention_mask, attn, -1e30)
    probs = jax.nn.softmax(attn, axis=-1)
    if head_mask is not None:
        probs = probs * head_mask
    out = jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v)
    return out, probs


class SelfAttention(nn.Module):
    """Attention over flattened latent dims of (b, heads, d1..dn, head_dim)."""

    attn_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        shape = q.shape
        b, h = shape[0], shape[1]
        d = shape[-1]
        q2 = q.reshape(b, h, -1, d)
        k2 = k.reshape(b, h, -1, d)
        v2 = v.reshape(b, h, -1, d)
        out, probs = scaled_dot_product_attention(q2, k2, v2, attention_mask, head_mask)
        if self.attn_dropout > 0 and not deterministic:
            out = nn.Dropout(self.attn_dropout, deterministic=False)(out)
        return out.reshape(shape[:-1] + (v.shape[-1],)), probs


class AxialAttention(nn.Module):
    """Attention along one latent axis (reference video_vqvae.py:21)."""

    axial_dim: int  # axis index within the latent dims (excluding b, h, dim)

    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # q: (b, h, d1..dn, dim); move the axial dim next to last, flatten the rest into batch.
        axial = self.axial_dim + 2  # offset for (b, h)
        q = jnp.moveaxis(q, axial, -2)
        k = jnp.moveaxis(k, axial, -2)
        v = jnp.moveaxis(v, axial, -2)
        pre_shape = q.shape
        q2 = q.reshape(-1, q.shape[-2], q.shape[-1])
        k2 = k.reshape(-1, k.shape[-2], k.shape[-1])
        v2 = v.reshape(-1, v.shape[-2], v.shape[-1])
        out, probs = scaled_dot_product_attention(q2, k2, v2, attention_mask, head_mask)
        out = out.reshape(pre_shape[:-1] + (v.shape[-1],))
        out = jnp.moveaxis(out, -2, axial)
        return out, probs


class MultiHeadAttention(nn.Module):
    """n-dim multihead attention with pluggable attention module and KV cache.

    Parity with reference ``attention.py:70-182``: separate q/k/v projections
    over ``(b, d1..dn, dim_q/dim_kv)`` inputs, pluggable ``attn_module``
    (full or axial), causal decode via explicit cache pytree.
    """

    dim_q: int
    dim_kv: int
    n_head: int
    attn_module: Optional[nn.Module] = None
    add_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None,
        return_attn_weights: bool = False,
        past_key_value: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        use_cache: bool = False,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """When ``cache_index`` is given along with ``past_key_value``, the
        cache is a fixed-size preallocated buffer written in place at that
        index (lax.scan-friendly decode); otherwise new K/V concatenate onto
        the cache (reference ``attention.py:156-169`` semantics)."""
        if self.dim_q % self.n_head or self.dim_kv % self.n_head:
            raise ValueError("dims must be divisible by n_head")
        kv = q if kv is None else kv
        latent_shape = q.shape[1:-1]

        dense = lambda d, name: nn.Dense(
            d, use_bias=self.add_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )

        def heads(x):
            b = x.shape[0]
            flat = x.reshape(b, -1, x.shape[-1])
            return split_multihead(flat, self.n_head)

        q_p = heads(dense(self.dim_q, "query")(q))
        k_p = heads(dense(self.dim_q, "key")(kv))
        v_p = heads(dense(self.dim_q, "value")(kv))

        if past_key_value is not None:
            if cache_index is not None:
                # shared fixed-buffer write: scalar, per-row (b,), or
                # per-position (b, s) indices — the same path the serving
                # engine drives for continuous batching / chunked prefill
                from multimodal_tpu.modules.layers.multi_head_attention import (
                    _write_fixed_cache,
                )

                k_p, v_p = _write_fixed_cache(
                    past_key_value, k_p, v_p, cache_index
                )
            else:
                k_p = jnp.concatenate([past_key_value[0], k_p], axis=2)
                v_p = jnp.concatenate([past_key_value[1], v_p], axis=2)
        present = (k_p, v_p)
        if is_quantized_kv(k_p):
            # int8 engine cache: this layer computes attention dequantized
            # (no Pallas decode kernel for the n-dim stack); the cache
            # itself stays int8
            k_p = k_p.dequantize(q_p.dtype)
            v_p = v_p.dequantize(q_p.dtype)

        attn_module = self.attn_module if self.attn_module is not None else SelfAttention()
        # Axial attention operates on unflattened latents.
        if isinstance(attn_module, AxialAttention):
            b = q.shape[0]
            hd = self.dim_q // self.n_head
            nd = lambda x: x.reshape((b, self.n_head) + latent_shape + (hd,))
            a, probs = attn_module(nd(q_p), nd(k_p), nd(v_p), attention_mask,
                                   head_mask, deterministic=deterministic)
            a = a.reshape(b, self.n_head, -1, hd)
        else:
            a, probs = attn_module(q_p, k_p, v_p, attention_mask, head_mask,
                                   deterministic=deterministic)

        out = merge_multihead(a)
        out = out.reshape((out.shape[0],) + latent_shape + (out.shape[-1],))
        # output projection always has a bias, regardless of add_bias
        # (reference attention.py:114)
        out = nn.Dense(self.dim_q, use_bias=True, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="output")(out)

        if use_cache and return_attn_weights:
            return out, present, probs
        if use_cache:
            return out, present
        if return_attn_weights:
            return out, probs
        return out
