"""Multi-head attention with fused QKV and optional KV cache.

Parity with reference ``modules/layers/multi_head_attention.py``
(MultiHeadSelfAttention:19, MultiHeadAttentionWithCache:83,
MHAWithCacheOutput:14). TPU-native design: QKV is one matmul onto the MXU;
the score/softmax/weighted-sum runs through
``multimodal_tpu.ops.scaled_dot_product_attention`` (Pallas flash kernel on
TPU). The KV cache is an explicit ``(k, v)`` pytree returned to the caller —
no hidden module state — so decode loops can carry it through ``lax.scan``
with ``dynamic_update_slice`` (see ``utils/generate.py``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.ops.attention import scaled_dot_product_attention
from multimodal_tpu.ops.fused_encoder import (
    fused_encoder_available,
    fused_qkv_attention,
    key_padding_bias,
)
from multimodal_tpu.ops.kv_cache import QuantizedKV, quantize_kv


class MHAWithCacheOutput(NamedTuple):
    attn_output: jnp.ndarray
    past_key_value: Tuple[jnp.ndarray, jnp.ndarray]


def _mask_or_bias(attn_mask):
    """Split a user mask into (bool mask, float bias) like torch SDPA."""
    if attn_mask is None:
        return None, None
    if attn_mask.dtype == jnp.bool_:
        return attn_mask, None
    return None, attn_mask


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _write_fixed_cache(
    past_key_value: Tuple[jnp.ndarray, jnp.ndarray],
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    cache_index: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write ``(b, h, s_new, d)`` keys/values into a preallocated
    ``(b, h, max_len, d)`` buffer at ``cache_index`` — scalar (same position
    for every row), a ``(b,)`` vector (per-row start positions, continuous
    batching), or a ``(b, s_new)`` matrix (per-row PER-POSITION targets —
    chunked prefill redirects a partial chunk's padding writes to a
    sacrificial position instead of letting a contiguous-block write clamp
    into, and corrupt, earlier cache entries)."""
    cache_k, cache_v = past_key_value
    idx = jnp.asarray(cache_index)

    def write_one(cache, new):
        if isinstance(cache, QuantizedKV):
            # int8 cache: quantize the incoming rows at write time
            q, scale = quantize_kv(new)
            return QuantizedKV(
                q=write_one(cache.q, q),
                scale=_write_positions(cache.scale, scale, idx),
            )
        new = new.astype(cache.dtype)
        if idx.ndim == 0:
            return jax.lax.dynamic_update_slice(cache, new, (0, 0, idx, 0))
        if idx.ndim == 2:
            # scatter each new position at its own target index
            return jax.vmap(lambda c, n, i: c.at[:, i].set(n))(
                cache, new, idx
            )
        # per-row start positions: a batched dynamic_update_slice (vmap over
        # the slot axis) lowers to one scatter, no host loop
        return jax.vmap(
            lambda c, n, i: jax.lax.dynamic_update_slice(c, n, (0, i, 0))
        )(cache, new, idx)

    return write_one(cache_k, k_new), write_one(cache_v, v_new)


def _write_positions(cache, new, idx):
    """Like the kv write but for per-position scale tensors (b, h, L)."""
    if idx.ndim == 0:
        return jax.lax.dynamic_update_slice(cache, new, (0, 0, idx))
    if idx.ndim == 2:
        return jax.vmap(lambda c, n, i: c.at[:, i].set(n))(cache, new, idx)
    return jax.vmap(
        lambda c, n, i: jax.lax.dynamic_update_slice(c, n, (0, i))
    )(cache, new, idx)


class MultiHeadSelfAttention(nn.Module):
    """Self-attention with a single fused QKV projection.

    ``cp_axis_name`` makes the layer sequence-parallel: self-attention runs
    the ring (zigzag when causal) over that mesh axis via
    ``parallel.sequence_parallel`` — requires no mask, no attention dropout,
    and the step to run under ``jax.set_mesh``. ``cp_layout='zigzag'``
    declares the model pre-split the sequence (``shard_sequence_for_cp``).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    cp_axis_name: Optional[str] = None
    cp_layout: str = "contiguous"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        is_causal: bool = False,
        return_attn_weights: bool = False,
        deterministic: bool = True,
    ):
        qkv = nn.Dense(
            3 * self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="input_proj"
        )(query)

        dropout_rng = None
        rate = self.dropout if not deterministic else 0.0
        if rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        # Short-sequence Pallas fast path (ops/fused_encoder): consume the
        # fused qkv buffer directly — no split/transpose copies, scores never
        # in HBM. Covers unmasked towers (ViT) and BERT-style key-padding
        # masks via the kernel's (B, S) bias lane; anything richer (per-query
        # masks, attention dropout, cp, prob taps) keeps the XLA/flash path.
        if (
            not return_attn_weights
            and self.cp_axis_name is None
            and rate == 0.0
            and query.ndim == 3
            and fused_encoder_available(
                query.shape[1], self.embed_dim, self.num_heads
            )
        ):
            key_bias = None
            fusable = attn_mask is None
            if not fusable:
                key_bias = key_padding_bias(
                    attn_mask, query.shape[0], query.shape[1]
                )
                fusable = key_bias is not None
            if fusable:
                attn = fused_qkv_attention(
                    qkv, self.num_heads, is_causal, None, key_bias
                )
                return nn.Dense(
                    self.embed_dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="output_proj",
                )(attn)

        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)

        if self.cp_axis_name is not None and not return_attn_weights:
            if attn_mask is not None:
                raise ValueError(
                    "context-parallel self-attention does not support an "
                    "attn_mask (use segment-id masking or cp_axis_name=None)"
                )
            if rate > 0.0:
                raise ValueError(
                    "context-parallel self-attention does not support "
                    "attention-prob dropout"
                )
            from multimodal_tpu.parallel.sequence_parallel import (
                sequence_parallel_self_attention,
            )

            attn = sequence_parallel_self_attention(
                q, k, v, self.cp_axis_name,
                causal=is_causal, layout=self.cp_layout,
            )
            attn = _merge_heads(attn)
            return nn.Dense(
                self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name="output_proj",
            )(attn)

        mask, bias = _mask_or_bias(attn_mask)
        probs = None
        if return_attn_weights:
            attn, probs = scaled_dot_product_attention(
                q, k, v, mask=mask, bias=bias, is_causal=is_causal,
                dropout_rate=rate, dropout_rng=dropout_rng, return_probs=True,
            )
        else:
            attn = scaled_dot_product_attention(
                q, k, v, mask=mask, bias=bias, is_causal=is_causal,
                dropout_rate=rate, dropout_rng=dropout_rng,
            )
        attn = _merge_heads(attn)
        out = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="output_proj"
        )(attn)
        if return_attn_weights:
            return out, probs
        return out


class MultiHeadAttentionWithCache(nn.Module):
    """Self- or cross-attention with separate q/k/v projections and KV cache.

    ``dim_kv`` may differ from ``dim_q`` (cross-attention to another
    modality). When ``past_key_value`` is given, new keys/values are
    concatenated along the sequence axis and the updated cache is returned
    (reference ``multi_head_attention.py:162-179``). When ``cache_index`` is
    ALSO given, ``past_key_value`` is instead treated as a preallocated
    fixed-size buffer and the new keys/values are written in place at that
    index — a scalar writes every row at the same position (scan decode, see
    ``utils/generate.py``); a ``(batch,)`` vector writes each row at its own
    position (continuous-batching serving, where every slot sits at a
    different sequence offset — see ``serving/engine.py``).
    """

    dim_q: int
    dim_kv: int
    num_heads: int
    dropout: float = 0.0
    add_bias: bool = True
    cp_axis_name: Optional[str] = None
    cp_layout: str = "contiguous"
    # grouped-query attention: project (and CACHE) only this many kv heads,
    # each shared by num_heads/num_kv_heads query heads — the KV cache (the
    # serving memory/bandwidth bottleneck) shrinks by the group factor, and
    # composes with the int8 cache. None = classic MHA.
    num_kv_heads: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        past_key_value: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        is_causal: bool = False,
        use_cache: bool = False,
        deterministic: bool = True,
        cache_index: Optional[jnp.ndarray] = None,
        rope_positions: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
    ):
        """``segment_ids`` ((b, s) int32): packed-sequence self-attention —
        positions attend only within their segment, composed with
        ``is_causal`` (block-diagonal causal). O(S) through the flash
        kernel's blockwise segment masking; training-shape only (no cache,
        no cp)."""
        if segment_ids is not None and (
            past_key_value is not None or use_cache or cache_index is not None
        ):
            raise ValueError("segment_ids are a training-shape feature "
                             "(no KV cache)")
        if segment_ids is not None and self.cp_axis_name is not None:
            raise ValueError(
                "segment_ids do not compose with context parallelism yet"
            )
        dense = lambda d, name: nn.Dense(
            d, use_bias=self.add_bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        kv_heads = self.num_kv_heads or self.num_heads
        if self.num_heads % kv_heads:
            raise ValueError(
                f"num_heads {self.num_heads} not divisible by num_kv_heads "
                f"{kv_heads}"
            )
        head_dim = self.dim_q // self.num_heads
        q = _split_heads(dense(self.dim_q, "q_proj")(query), self.num_heads)
        k = _split_heads(dense(kv_heads * head_dim, "k_proj")(key), kv_heads)
        v = _split_heads(
            dense(kv_heads * head_dim, "v_proj")(value), kv_heads
        )
        if rope_positions is not None:
            # rotate q and the NEW k rows by their token positions; cached
            # k rows were rotated at their own write time — q·k then sees
            # only relative offsets, so positions may grow without bound
            # (the engine's sliding-window streaming mode relies on this)
            from multimodal_tpu.ops.rotary import apply_rotary

            q = apply_rotary(q, rope_positions)
            k = apply_rotary(k, rope_positions)

        cache_out: Optional[Tuple[Any, Any]] = None
        quantized_attn = None
        if past_key_value is not None:
            if cache_index is not None:
                ck, cv = _write_fixed_cache(past_key_value, k, v, cache_index)
                cache_out = (ck, cv)
                if isinstance(ck, QuantizedKV):
                    from multimodal_tpu.ops.quantized_attention import (
                        quantized_cache_attention,
                        supports_quantized_attention,
                    )

                    rate_now = self.dropout if not deterministic else 0.0
                    if supports_quantized_attention(
                        q, attn_mask, rate_now, is_causal,
                        kv_heads=kv_heads,
                    ):
                        # Pallas kernel: dequantize in VMEM so HBM reads stay
                        # int8 (XLA would materialize the dense cache)
                        quantized_attn = quantized_cache_attention(
                            q, ck, cv, attn_mask
                        )
                    else:
                        k = ck.dequantize(k.dtype)
                        v = cv.dequantize(v.dtype)
                else:
                    k, v = ck, cv
            else:
                k = jnp.concatenate([past_key_value[0], k], axis=2)
                v = jnp.concatenate([past_key_value[1], v], axis=2)
        if quantized_attn is not None:
            out = dense(self.dim_q, "output_proj")(_merge_heads(quantized_attn))
            if use_cache:
                return MHAWithCacheOutput(out, cache_out)
            return out

        dropout_rng = None
        rate = self.dropout if not deterministic else 0.0
        if rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        kv_present = (k, v)  # pre-broadcast kv (what a fresh cache stores)
        if kv_heads != self.num_heads:
            # broadcast each kv head to its query group for the compute;
            # the cache (what actually lives in HBM between ticks) keeps
            # only kv_heads rows
            group = self.num_heads // kv_heads
            k = jnp.repeat(k, group, axis=1)
            v = jnp.repeat(v, group, axis=1)

        # Context-parallel path: training-shape SELF-attention only (the
        # decoder layer passes the same array as q/k/v; decode-time caching
        # and masks keep the standard path). Cross-attention needs no ring —
        # with K/V replicated over cp, GSPMD parallelizes it as-is.
        if (
            self.cp_axis_name is not None
            and key is query and value is query
            and past_key_value is None and not use_cache
            and attn_mask is None and rate == 0.0
        ):
            from multimodal_tpu.parallel.sequence_parallel import (
                sequence_parallel_self_attention,
            )

            attn = sequence_parallel_self_attention(
                q, k, v, self.cp_axis_name,
                causal=is_causal, layout=self.cp_layout,
            )
            return dense(self.dim_q, "output_proj")(_merge_heads(attn))

        mask, bias = _mask_or_bias(attn_mask)
        attn = scaled_dot_product_attention(
            q, k, v, mask=mask, bias=bias, is_causal=is_causal,
            dropout_rate=rate, dropout_rng=dropout_rng,
            segment_ids=segment_ids,
        )
        out = dense(self.dim_q, "output_proj")(_merge_heads(attn))
        if use_cache:
            return MHAWithCacheOutput(
                out, cache_out if cache_out is not None else kv_present
            )
        return out
