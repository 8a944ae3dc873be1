"""Q-Former mask helpers.

Parity with reference ``models/blip2/qformer_utils.py`` (get_causal_mask:14):
causal masking over the text suffix with a fully-attendable prefix (cached
context or queries); with a query prefix, queries attend each other but not
the text tokens.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_causal_mask(
    attention_mask: jnp.ndarray,
    input_shape: Tuple[int, int],
    has_query: bool = False,
) -> jnp.ndarray:
    """Boolean (1/0 float) causal mask combined with a prefix.

    attention_mask: (b, attn_seq_len) padding mask (1 = attend).
    input_shape: (b, input_seq_len) of the embedding output; input_seq_len
    may be shorter than attn_seq_len when a prefix is cached.

    Returns (b, q_len, attn_seq_len) mask with 1 = attend.
    """
    batch_size, seq_len = input_shape
    causal = jnp.tril(jnp.ones((seq_len, seq_len), jnp.float32))
    causal = jnp.broadcast_to(causal[None], (batch_size, seq_len, seq_len))
    attn_len = attention_mask.shape[1]
    if seq_len < attn_len:
        prefix_len = attn_len - seq_len
        if has_query:
            # queries attend each other but not the text tokens
            causal = jnp.concatenate(
                [jnp.zeros((batch_size, prefix_len, seq_len), jnp.float32), causal],
                axis=1,
            )
        causal = jnp.concatenate(
            [jnp.ones((batch_size, causal.shape[1], prefix_len), jnp.float32), causal],
            axis=-1,
        )
    return causal
