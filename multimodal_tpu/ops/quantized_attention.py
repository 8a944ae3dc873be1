"""Pallas decode attention over an int8-quantized KV cache.

Why a kernel: storing the KV cache as int8 (``ops/kv_cache.py``) only pays
if the dequantized bf16 cache never round-trips through HBM. Left to XLA,
``(q_int8 * scale) @ ...`` materializes the full dense cache per layer per
tick — measured 0.62x of the bf16 baseline, i.e. slower. This kernel keeps
the cache int8 all the way to the MXU: blocks load as int8, convert to
bf16 in-register, and the per-position scales are applied to the tiny
``(S, L)`` score/probability rows AFTER the matmuls (``q·(k s) = (q·k) s``
per k-position; ``p·(v s) = (p s)·v`` per v-position), so the dense
``(L, d)`` cache is never materialized anywhere and HBM traffic per tick
is the int8 bytes plus an ``L``-vector of scales per head.

Layout notes (the first version got these wrong and was 2.4x SLOWER than
bf16): scales must be fed lane-major — a ``(b, h, 1, L)`` view with
``(1, 1, 1, L)`` blocks — because a ``(L, 1)``-shaped block puts the scale on
the sublane axis and Mosaic pads each ``(8, 1)`` sliver to an ``(8, 128)``
VMEM tile (~1 MB of VMEM per scale vector, killing double-buffering); and
the matmuls must run in bf16 (native MXU pass) rather than
fp32-``HIGHEST`` (a multi-pass emulation). Both error terms — bf16 matmul
rounding and 127-level quantization — are ~0.4% relative, below the
tolerances the tests assert.

Decode shapes make the rest simple: the query block is tiny (1 token per
tick; up to ``gamma + 1`` for the speculative verifier), so no
online-softmax tiling is needed — each ``(batch, head)`` program holds its
whole (padded) ``(8, L)`` score row set in VMEM. ``L`` (the cache
capacity) is the lane dim and must be a multiple of 128; head dim rides
the MXU unchanged.

Used by ``MultiHeadAttentionWithCache`` whenever the fixed-buffer cache is
a ``QuantizedKV`` and the query block is small; larger query blocks (bulk
prefill) fall back to dequantize-into-XLA, where the matmul is
compute-bound anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from multimodal_tpu.ops.kv_cache import QuantizedKV

SUBLANES = 8
LANES = 128


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, mask_ref, o_ref, *,
            sm_scale):
    q = q_ref[0, 0].astype(jnp.bfloat16)                     # (S, d)
    k = kq_ref[0, 0].astype(jnp.bfloat16)                    # (L, d) int8→bf16
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (S, L) f32
    # fold the k-position scales (and 1/sqrt(d)) into the score row
    s = s * (ks_ref[0, 0] * sm_scale)
    s = jnp.where(mask_ref[0], s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # v-position scales ride the probability row; matmul stays int8→bf16
    p = (p * vs_ref[0, 0]).astype(jnp.bfloat16)
    v = vq_ref[0, 0].astype(jnp.bfloat16)                    # (L, d)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@jax.jit
def quantized_cache_attention(
    q: jnp.ndarray,
    k_cache: QuantizedKV,
    v_cache: QuantizedKV,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Attention of a small query block against an int8 KV cache.

    Args:
        q: ``(b, h, S, d)`` with small S (decode tick / verify window).
        k_cache/v_cache: ``QuantizedKV`` with ``q`` ``(b, h, L, d)`` int8 and
            ``scale`` ``(b, h, L)``; ``L % 128 == 0``.
        mask: bool, broadcastable to ``(b, 1, S, L)`` — True = attend.
    Returns:
        ``(b, h, S, d)`` in ``q``'s dtype.
    """
    b, h_q, S, d = q.shape
    h = k_cache.q.shape[1]
    L = k_cache.q.shape[2]
    mask = jnp.broadcast_to(mask, (b, 1, S, L))[:, 0]
    if h_q != h:
        # grouped-query attention: stack each kv head's query group into
        # the sublane (row) dim — one program still serves one kv head,
        # and the int8 cache block is read once for the whole group
        group = h_q // h
        q = q.reshape(b, h, group * S, d)
        mask = jnp.broadcast_to(
            mask[:, None], (b, group, S, L)
        ).reshape(b, group * S, L)
        S = group * S
    sp = -(-S // SUBLANES) * SUBLANES  # pad query rows to full sublanes
    if sp != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sp - S), (0, 0)))
        # padded query rows attend position 0 only (keeps softmax finite)
        pad_rows = jnp.zeros((b, sp - S, L), bool).at[:, :, 0].set(True)
        mask = jnp.concatenate([mask, pad_rows], axis=1)

    grid = (b, h)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, sp, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, L, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, 1, L), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, L, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, 1, L), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, sp, L), lambda b_, h_: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, sp, d), lambda b_, h_: (b_, h_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, d), q.dtype),
        interpret=_interpret(),
    )(
        q,
        k_cache.q,
        k_cache.scale[:, :, None, :],  # lane-major: (b, h, 1, L)
        v_cache.q,
        v_cache.scale[:, :, None, :],
        mask,
    )
    out = out[:, :, :S]
    if h_q != h:
        out = out.reshape(b, h_q, S // (h_q // h), d)
    return out


# per-(batch, head) program VMEM budget: int8 K+V (2·L·d) + their bf16
# in-register copies (4·L·d) + f32 score rows — cap the cache block at 2 MB
# so the worst case stays well inside the ~16 MB VMEM budget; larger
# configs fall back to dequantize-into-XLA instead of failing to compile
_MAX_BLOCK_BYTES = 2 * 1024 * 1024


def supports_quantized_attention(
    q, attn_mask, dropout_rate: float, is_causal: bool = False,
    kv_heads: int = 0,
) -> bool:
    """Kernel applicability: tiny query block (a kv head's whole query
    group must fit the sublanes), boolean head-broadcast mask (sole mask —
    the kernel does not add causal masking), no attention dropout,
    lane-aligned cache length, VMEM-sized cache block."""
    if dropout_rate > 0.0 or attn_mask is None or is_causal:
        return False
    if attn_mask.dtype != jnp.bool_:
        return False
    if attn_mask.ndim != 4 or attn_mask.shape[1] != 1:
        return False
    if attn_mask.shape[-1] * q.shape[-1] > _MAX_BLOCK_BYTES:
        return False
    group = q.shape[1] // kv_heads if kv_heads else 1
    return (
        group * q.shape[2] <= SUBLANES
        and attn_mask.shape[-1] % LANES == 0
    )
