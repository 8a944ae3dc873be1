"""Attention-mask helpers.

Capability parity with reference ``torchmultimodal/utils/attention.py``
(get_extended_attention_mask:13, get_causal_attention_mask:56), expressed as
pure jnp functions producing either additive-bias or boolean masks.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e9  # large-negative additive bias; safe in bf16/fp32 softmax


def get_extended_attention_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a padding mask to attention-bias shape.

    Args:
        attention_mask: ``(batch, seq)``, ``(batch, q, k)``, or an already
            head-broadcast ``(batch, heads, q, k)`` (reference :30-34);
            1 = attend.
    Returns:
        float bias of shape ``(batch, 1, 1, seq)``, ``(batch, 1, q, k)``, or
        ``(batch, heads, q, k)`` with 0 where attended and a large negative
        value where masked.
    """
    if attention_mask.ndim == 2:
        ext = attention_mask[:, None, None, :]
    elif attention_mask.ndim == 3:
        ext = attention_mask[:, None, :, :]
    elif attention_mask.ndim == 4:
        ext = attention_mask
    else:
        raise ValueError(f"bad attention mask ndim {attention_mask.ndim}")
    return (1.0 - ext.astype(jnp.float32)) * NEG_INF


def get_causal_attention_mask(tgt_len: int, src_len: Optional[int] = None) -> jnp.ndarray:
    """Lower-triangular boolean mask ``(tgt_len, src_len)``; True = attend."""
    if src_len is None:
        src_len = tgt_len
    return jnp.tril(jnp.ones((tgt_len, src_len), dtype=bool))


def combine_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """AND together boolean masks (broadcasting), skipping Nones."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_and(out, m)
    return out
