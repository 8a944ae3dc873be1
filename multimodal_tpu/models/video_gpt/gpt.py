"""Multimodal GPT (VideoGPT-style cross-modality generation).

Parity with reference ``models/video_gpt/gpt.py`` (MultimodalGPT:66,
MultimodalTransformerDecoder:384, TransformerDecoder:518,
TransformerDecoderLayer:608, RightShift:739).

TPU-native decode: KV caches are explicit fixed-size pytrees threaded with a
``cache_index`` (see ``utils/generate.py``'s lax.scan sampler) instead of
the reference's growing dict caches.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple, Union

import math
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.activation import quick_gelu
from multimodal_tpu.modules.layers.attention import MultiHeadAttention, SelfAttention
from multimodal_tpu.modules.layers.mlp import MLP


class TransformerDecoderOutput(NamedTuple):
    last_hidden_states: jnp.ndarray
    hidden_states: Optional[Tuple[jnp.ndarray, ...]] = None
    attention_weights: Optional[Tuple[jnp.ndarray, ...]] = None
    past_key_values: Optional[Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]] = None


class TransformerLayerOutput(NamedTuple):
    hidden_states: jnp.ndarray
    attention_weights: Optional[jnp.ndarray] = None
    past_key_values: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None


class MultimodalGPTOutput(NamedTuple):
    decoder_output: TransformerDecoderOutput
    logits: jnp.ndarray


class RightShift(nn.Module):
    """Shift right along sequence, prepend learnable SOS (reference :739)."""

    embedding_dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sos = self.param(
            "sos", nn.initializers.normal(0.02), (self.embedding_dim,), self.param_dtype
        )
        b = x.shape[0]
        sos_tok = jnp.broadcast_to(
            sos.astype(x.dtype)[None, None, :], (b, 1, self.embedding_dim)
        )
        return jnp.concatenate([sos_tok, x[:, :-1, :]], axis=1)


class TransformerDecoderLayer(nn.Module):
    """Pre-LN GPT block over n-dim attention (reference :608)."""

    d_model: int = 768
    n_head: int = 12
    dropout: float = 0.1
    attn_dropout: float = 0.1
    activation: Union[str, Callable] = "quick_gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
        causal: bool = False,
        return_attn_weights: bool = False,
        past_key_value: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> TransformerLayerOutput:
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name=name
        )
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        h = ln("norm_attn")(x.astype(jnp.float32)).astype(x.dtype)
        attn_out = MultiHeadAttention(
            dim_q=self.d_model, dim_kv=self.d_model, n_head=self.n_head,
            attn_module=SelfAttention(self.attn_dropout), add_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attention",
        )(
            h,
            attention_mask=attn_mask,
            head_mask=head_mask,
            return_attn_weights=return_attn_weights,
            past_key_value=past_key_value,
            use_cache=use_cache,
            cache_index=cache_index,
            deterministic=deterministic,
        )
        present = None
        probs = None
        if use_cache and return_attn_weights:
            attn_h, present, probs = attn_out
        elif use_cache:
            attn_h, present = attn_out
        elif return_attn_weights:
            attn_h, probs = attn_out
        else:
            attn_h = attn_out
        x = x + drop(attn_h)

        h = ln("norm_mlp")(x.astype(jnp.float32)).astype(x.dtype)
        mlp_out = MLP(
            in_dim=self.d_model, out_dim=self.d_model,
            hidden_dims=[self.d_model * 4], dropout=0.0,
            activation=self.activation, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mlp",
        )(h, deterministic=deterministic)
        x = x + drop(mlp_out)
        return TransformerLayerOutput(x, probs, present)


class TransformerDecoder(nn.Module):
    """Stack of GPT layers threading per-layer caches (reference :518)."""

    num_layers: int = 12
    d_model: int = 768
    n_head: int = 12
    dropout: float = 0.1
    attn_dropout: float = 0.1
    activation: Union[str, Callable] = "quick_gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
        causal: bool = False,
        return_attn_weights: bool = False,
        return_hidden_states: bool = False,
        past_key_values: Optional[Tuple] = None,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> TransformerDecoderOutput:
        if attn_mask is not None and attn_mask.ndim == 2:
            attn_mask = attn_mask[None, None]
        if attn_mask is not None and attn_mask.ndim == 3:
            attn_mask = attn_mask[:, None]
        if attn_mask is not None and attn_mask.dtype != jnp.bool_:
            attn_mask = attn_mask.astype(bool)
        if causal and attn_mask is None and cache_index is None:
            s = hidden_states.shape[1]
            attn_mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if head_mask is not None and head_mask.ndim == 3:
            head_mask = head_mask[None]

        all_hidden, all_attn, all_kv = [], [], []
        for i in range(self.num_layers):
            if return_hidden_states:
                all_hidden.append(hidden_states)
            pkv = past_key_values[i] if past_key_values is not None else None
            out = TransformerDecoderLayer(
                self.d_model, self.n_head, self.dropout, self.attn_dropout,
                self.activation, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(
                hidden_states, attn_mask, head_mask, use_cache, causal,
                return_attn_weights, pkv, cache_index, deterministic,
            )
            hidden_states = out.hidden_states
            if return_attn_weights:
                all_attn.append(out.attention_weights)
            if use_cache:
                all_kv.append(out.past_key_values)
        if return_hidden_states:
            all_hidden.append(hidden_states)

        return TransformerDecoderOutput(
            last_hidden_states=hidden_states,
            hidden_states=tuple(all_hidden) if return_hidden_states else None,
            attention_weights=tuple(all_attn) if return_attn_weights else None,
            past_key_values=tuple(all_kv) if use_cache else None,
        )


class MultimodalTransformerDecoder(nn.Module):
    """Per-modality position embeddings + SOS right-shift + GPT stack
    (reference :384)."""

    in_pos_emb: nn.Module
    out_pos_emb: nn.Module
    decoder: nn.Module
    right_shift: nn.Module

    def __call__(
        self,
        in_modality: Optional[jnp.ndarray] = None,
        out_modality: Optional[jnp.ndarray] = None,
        in_pos_ids: Optional[jnp.ndarray] = None,
        out_pos_ids: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
        causal: bool = False,
        right_shift: bool = False,
        return_attn_weights: bool = False,
        return_hidden_states: bool = False,
        past_key_values: Optional[Tuple] = None,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> TransformerDecoderOutput:
        if in_modality is None and out_modality is None:
            raise ValueError("in_modality and out_modality sequences cannot be both empty")

        def norm_pos(x, pos_ids):
            if pos_ids is None:
                pos_ids = jnp.arange(x.shape[1], dtype=jnp.int32)[None]
            if pos_ids.shape[1] != x.shape[1]:
                raise ValueError(
                    f"Input sequence and position ids must be equal in length: "
                    f"{pos_ids.shape[1]} != {x.shape[1]}"
                )
            return pos_ids

        if in_modality is None:
            out_pos_ids = norm_pos(out_modality, out_pos_ids)
            x = out_modality + self.out_pos_emb(out_pos_ids).astype(out_modality.dtype)
        elif out_modality is None:
            in_pos_ids = norm_pos(in_modality, in_pos_ids)
            x = in_modality + self.in_pos_emb(in_pos_ids).astype(in_modality.dtype)
        else:
            in_pos_ids = norm_pos(in_modality, in_pos_ids)
            out_pos_ids = norm_pos(out_modality, out_pos_ids)
            x_in = in_modality + self.in_pos_emb(in_pos_ids).astype(in_modality.dtype)
            x_out = out_modality + self.out_pos_emb(out_pos_ids).astype(out_modality.dtype)
            x = jnp.concatenate([x_in, x_out], axis=1)

        if not deterministic or right_shift:
            x = self.right_shift(x)

        return self.decoder(
            x, attn_mask, head_mask, use_cache, causal,
            return_attn_weights, return_hidden_states,
            past_key_values=past_key_values, cache_index=cache_index,
            deterministic=deterministic,
        )


class MultimodalGPT(nn.Module):
    """Cross-modality GPT wrapping in/out tokenizers (reference :66).

    Tokenizers must expose ``encode``/``lookup`` (in) and
    ``encode``/``lookup``/``decode`` (out) — enforced at construction like
    the reference (:111-126).
    """

    d_model: int
    num_in_tokens: int
    num_out_tokens: int
    latent_shape: Tuple[int, ...]
    in_tokenizer: nn.Module
    out_tokenizer: nn.Module
    mm_decoder: nn.Module
    use_in_projection: bool = True
    use_out_projection: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def __post_init__(self):
        for attr in ("encode", "lookup"):
            if not hasattr(self.in_tokenizer, attr):
                raise AttributeError(
                    "Input modality tokenizer must have methods 'encode' and 'lookup'."
                )
        for attr in ("encode", "lookup", "decode"):
            if not hasattr(self.out_tokenizer, attr):
                raise AttributeError(
                    "Output modality tokenizer must have methods 'encode', 'lookup' and 'decode'."
                )
        super().__post_init__()

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype)
        self.to_logit = nn.Dense(
            self.num_in_tokens + self.num_out_tokens, use_bias=False,
            kernel_init=nn.initializers.zeros,  # equal probs initially (reference :144)
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        if self.use_in_projection:
            self.in_projection = nn.Dense(
                self.d_model, use_bias=False,
                kernel_init=nn.initializers.normal(0.02),
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
        if self.use_out_projection:
            self.out_projection = nn.Dense(
                self.d_model, use_bias=False,
                kernel_init=nn.initializers.normal(0.02),
                dtype=self.dtype, param_dtype=self.param_dtype,
            )

    def __call__(
        self,
        in_tokens: Optional[jnp.ndarray] = None,
        out_tokens: Optional[jnp.ndarray] = None,
        in_pos_ids: Optional[jnp.ndarray] = None,
        out_pos_ids: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None,
        logits_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
        causal: bool = False,
        right_shift: bool = False,
        return_attn_weights: bool = False,
        return_hidden_states: bool = False,
        past_key_values: Optional[Tuple] = None,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> MultimodalGPTOutput:
        decoder_output = self.fwd(
            in_tokens=in_tokens, out_tokens=out_tokens,
            in_pos_ids=in_pos_ids, out_pos_ids=out_pos_ids,
            attn_mask=attn_mask, head_mask=head_mask, use_cache=use_cache,
            causal=causal, right_shift=right_shift,
            return_attn_weights=return_attn_weights,
            return_hidden_states=return_hidden_states,
            past_key_values=past_key_values, cache_index=cache_index,
            deterministic=deterministic,
        )
        logits = self.logit_projection(decoder_output.last_hidden_states, logits_mask)
        return MultimodalGPTOutput(decoder_output, logits)

    def init_weights(
        self,
        video_in: jnp.ndarray,
        video_out: jnp.ndarray,
        in_tokens: jnp.ndarray,
        out_tokens: jnp.ndarray,
    ) -> MultimodalGPTOutput:
        """Init-time helper exercising every submodule (tokenizer encoders /
        decoders, right-shift, decoder stack) so flax materializes all params
        in one ``model.init`` call."""
        _ = self.encode(video_in, "in")
        _ = self.encode(video_out, "out")
        latent_tokens = jnp.zeros(
            (video_out.shape[0], math.prod(self.latent_shape)),
            jnp.int32,
        )
        _ = self.decode(latent_tokens)
        return self(
            in_tokens=in_tokens, out_tokens=out_tokens, causal=True, right_shift=True
        )

    def fwd(
        self,
        in_tokens: Optional[jnp.ndarray] = None,
        out_tokens: Optional[jnp.ndarray] = None,
        **kwargs: Any,
    ) -> TransformerDecoderOutput:
        if in_tokens is None and out_tokens is None:
            raise ValueError(
                "input-modality token and output-modality token sequences cannot be both empty"
            )
        in_modality = out_modality = None
        if in_tokens is not None:
            in_modality = self.lookup(in_tokens, "in")
            if self.use_in_projection:
                in_modality = self.in_projection(in_modality)
        if out_tokens is not None:
            out_modality = self.lookup(out_tokens, "out")
            if self.use_out_projection:
                out_modality = self.out_projection(out_modality)
        return self.mm_decoder(
            in_modality=in_modality, out_modality=out_modality, **kwargs
        )

    def logit_projection(
        self, hidden_states: jnp.ndarray, logits_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if logits_mask is not None and logits_mask.ndim == 2:
            logits_mask = logits_mask[None]
        h = self.norm(hidden_states.astype(jnp.float32)).astype(hidden_states.dtype)
        logits = self.to_logit(h).astype(jnp.float32)
        if logits_mask is not None:
            logits = jnp.where(logits_mask == 0, jnp.finfo(jnp.float32).min, logits)
        return logits

    def encode(self, x: Any, modality: str, **kwargs: Any) -> jnp.ndarray:
        if modality == "in":
            encoder = self.in_tokenizer.encode
        elif modality == "out":
            encoder = self.out_tokenizer.encode
        else:
            raise ValueError(f"Invalid modality parameter: {modality}")
        token_ids = encoder(x, **kwargs)
        return token_ids.reshape(token_ids.shape[0], -1)

    def decode(self, token_ids: jnp.ndarray, **kwargs: Any) -> Any:
        if token_ids.ndim != 2:
            raise ValueError(
                f"Shape of token ids should be (batch, seq_len) but got {token_ids.shape}"
            )
        latent_seq_len = math.prod(self.latent_shape)
        if token_ids.shape[1] != latent_seq_len:
            raise ValueError(
                f"Sequence to decode does not match that inferred from the tokenizer: {latent_seq_len}"
            )
        token_ids = token_ids.reshape((token_ids.shape[0],) + tuple(self.latent_shape))
        return self.out_tokenizer.decode(token_ids, **kwargs)

    def lookup(self, token_ids: jnp.ndarray, modality: str) -> jnp.ndarray:
        if modality == "in":
            return self.in_tokenizer.lookup(token_ids)
        if modality == "out":
            return self.out_tokenizer.lookup(token_ids)
        raise ValueError(f"Invalid modality parameter: {modality}")
