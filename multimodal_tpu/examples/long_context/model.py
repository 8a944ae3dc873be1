"""Long-context causal LM — the model-level consumer of context parallelism.

No reference counterpart: the reference tops out at 1024-token sequences
(``torchmultimodal`` GPTs) and has no sequence-axis parallelism at all;
SURVEY §5.7 makes long-context training a required first-class capability of
the TPU rebuild. This model is the canonical wiring:

  embed (+ positions) -> shard_sequence_for_cp (zigzag, once)
  -> TransformerDecoder(cp_axis_name, cp_layout='zigzag') x N
  -> unshard_sequence_for_cp -> LM head

Every decoder layer's causal self-attention runs the load-balanced zigzag
ring over the ``cp`` mesh axis with Pallas-flash block kernels
(``parallel/context_parallel.py``); MLPs/norms stay ordinary GSPMD code, so
only the embedding boundary touches layout. With ``cp_axis_name=None`` the
same module is a plain (single-device-sequence) GPT — identical parameters,
which is what the cp==1 equivalence tests rely on.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.transformer import TransformerDecoder
from multimodal_tpu.parallel.sequence_parallel import (
    shard_sequence_for_cp,
    unshard_sequence_for_cp,
)


class LongContextLM(nn.Module):
    """Decoder-only causal LM with optional sequence (context) parallelism."""

    vocab_size: int
    max_seq_len: int
    n_layer: int = 12
    d_model: int = 768
    n_head: int = 12
    dim_feedforward: int = 3072
    dropout: float = 0.0
    cp_axis_name: Optional[str] = None
    # MoE (expert parallelism): swap every ``moe_interval``-th layer's MLP
    # for a routed MoEFeedForward sharded over ``ep_axis_name``. Composes
    # with cp: attention rides the ring, experts ride the all-to-all.
    moe_num_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_interval: int = 2
    ep_axis_name: Optional[str] = None
    # grouped-query attention: kv heads cached/projected (None = n_head)
    n_kv_head: Optional[int] = None
    remat: bool = False
    # "learned" absolute embeddings (positions < max_seq_len), or "rope" —
    # rotary, applied per layer inside attention; positions are then
    # unbounded, which the serving engine's sliding-window streaming mode
    # (window=) requires
    positional: str = "learned"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        deterministic: bool = True,
        positions: Optional[jnp.ndarray] = None,
        past_key_values=None,
        cache_index: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
        segment_ids: Optional[jnp.ndarray] = None,
    ):
        """Training/eval forward (defaults), or incremental decode when a
        preallocated ``past_key_values`` + ``cache_index`` is given (the
        serving engine's fixed-buffer path — ``serving/engine.py``).
        ``positions`` ((b, s) int32) overrides the default ``arange``
        position ids for slots sitting at heterogeneous offsets."""
        b, s = tokens.shape
        if past_key_values is not None and self.cp_axis_name is not None:
            raise ValueError("KV-cache decode does not compose with cp")
        if segment_ids is not None and self.cp_axis_name is not None:
            raise ValueError("packed segment_ids do not compose with cp yet")
        x = nn.Embed(
            self.vocab_size, self.d_model, param_dtype=self.param_dtype,
            name="tok_embed",
        )(tokens).astype(self.dtype)
        pos_ids = jnp.arange(s)[None, :] if positions is None else positions
        rope_positions = None
        if self.positional == "rope":
            if self.cp_axis_name is not None:
                raise ValueError(
                    "rope does not compose with cp yet (positions would "
                    "need the zigzag split)"
                )
            rope_positions = jnp.broadcast_to(pos_ids, (b, s))
        elif self.positional == "learned":
            pos = nn.Embed(
                self.max_seq_len, self.d_model, param_dtype=self.param_dtype,
                name="pos_embed",
            )(pos_ids).astype(self.dtype)
            x = x + pos
        else:
            raise ValueError(f"unknown positional scheme {self.positional!r}")

        # positions are already attached -> safe to reorder the sequence into
        # the zigzag layout once; every layer's ring then runs balanced
        if self.cp_axis_name is not None:
            x = shard_sequence_for_cp(x, self.cp_axis_name, causal=True, seq_axis=1)

        out = TransformerDecoder(
            n_layer=self.n_layer,
            d_model=self.d_model,
            n_head=self.n_head,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation="gelu",
            layer_norm_eps=1e-5,
            norm_first=True,
            use_cross_attention=False,
            final_layer_norm_eps=1e-5,
            remat=self.remat,
            cp_axis_name=self.cp_axis_name,
            cp_layout="zigzag",
            moe_num_experts=self.moe_num_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_interval=self.moe_interval,
            ep_axis_name=self.ep_axis_name,
            n_kv_head=self.n_kv_head,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="decoder",
        )(
            x,
            attention_mask=attention_mask,
            past_key_values=past_key_values,
            use_cache=use_cache,
            # with an explicit mask (decode over a fixed buffer) causality is
            # the caller's responsibility; plain forwards stay causal
            is_causal=attention_mask is None,
            deterministic=deterministic,
            cache_index=cache_index,
            rope_positions=rope_positions,
            segment_ids=segment_ids,
        )
        h = out.last_hidden_state

        if self.cp_axis_name is not None:
            h = unshard_sequence_for_cp(h, self.cp_axis_name, causal=True, seq_axis=1)

        logits = nn.Dense(
            self.vocab_size, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="lm_head",
        )(h)
        if use_cache:
            return logits, out.current_key_values
        return logits


def next_token_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy of aligned (logits, targets). Callers feed the
    model ``tokens[:, :-1]`` and pass ``tokens[:, 1:]`` here, keeping the
    model's sequence length divisible by 2*cp for the zigzag layout."""
    logp = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def packed_next_token_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    segment_ids: jnp.ndarray,
) -> jnp.ndarray:
    """Next-token loss over a PACKED batch (``data/packing.py``).

    Callers feed the model ``tokens[:, :-1]`` with
    ``segment_ids[:, :-1]`` and pass ``tokens[:, 1:]`` /
    ``segment_ids`` here. A position contributes only when its target is
    the next token of the SAME document (segment unchanged across the
    boundary) and is not padding — predictions never cross documents or
    score pad positions."""
    valid = (segment_ids[:, :-1] == segment_ids[:, 1:]) & (
        segment_ids[:, 1:] > 0
    )
    logp = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom
