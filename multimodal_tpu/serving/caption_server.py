"""Continuous-batching image-captioning server for CoCa.

The reference has no captioning decode path at all — its CoCa
(``models/coca/coca_model.py:34``) computes teacher-forced captioning
logits for the loss and stops there; there is no sampler, no KV cache
wiring, no serving. This module puts CoCa caption *generation* behind
``serving.InferenceEngine``: image requests get continuous batching,
bucketed/chunked prefill, multi-step decode scheduling, per-request
sampling — with each slot cross-attending ITS OWN image through the
engine's per-slot conditioning buffer (``conditioning_spec``).

How CoCa's two-stage decoder maps onto the engine's causal-LM surface
(``apply(params, tokens, positions=, past_key_values=, cache_index=,
attention_mask=, use_cache=True, conditioning=) -> (logits, kvs)``):

  - The captioning path is text-decoder hidden states (WITHOUT the
    appended contrastive CLS token — causality means non-CLS positions
    never see it, so dropping it is exact) fed through the multimodal
    decoder's cross-attention stack and the output projection
    (reference ``coca_model.py:227-238``).
  - Both stages are causal self-attention stacks, so the engine's one
    flat KV cache holds ``text_n_layer + fusion_n_layer`` layers; the
    adapter splits it. Cross-attention K/V against the (small, ~256
    token) pooled image state are recomputed per call — cheaper than a
    second cache protocol, and idle slots' zero rows are harmless
    (their outputs land in the trash row).
  - The per-request conditioning row IS the image: the captioning
    tokens from the vision pooler's first stage (cascaded) or tokens
    1..n (parallel), reference ``coca_model.py:106-111``. ``encode()``
    computes them (plus the contrastive embedding) in one jitted
    vision forward; ``submit()`` hands the row to the engine, which
    scatters it into the slot's buffer at admission.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.models.coca.coca_model import CoCaModel, _l2norm
from multimodal_tpu.modules.layers.attention_pooler import (
    CascadedAttentionPooler,
)
from multimodal_tpu.modules.layers.transformer import (
    TransformerDecoder,
    TransformerOutput,
)
from multimodal_tpu.serving.engine import InferenceEngine, Request


class CoCaCaptionAdapter:
    """CoCa's captioning decode path behind the engine's LM surface.

    A plain object (not a flax module): ``apply`` reads the embedding
    tables straight out of the CoCa param tree and drives the two inner
    ``TransformerDecoder`` stacks — reconstructed here with the exact
    hyperparameters ``CoCaTextDecoder.setup`` / ``CoCaMultimodalDecoder``
    use, so the param subtrees bind unchanged.
    """

    def __init__(self, model: CoCaModel):
        td = model.text_decoder
        md = model.multimodal_decoder
        if md.output_dim is None:
            raise ValueError(
                "captioning requires multimodal_output_projection_dim "
                "(the vocab logits projection)"
            )
        if td.embedding_dim != md.text_embedding_dim:
            raise ValueError(
                "text decoder hidden dim must equal multimodal decoder "
                f"input dim ({td.embedding_dim} != {md.text_embedding_dim})"
            )
        self.model = model
        self.n_text_layers = td.n_layer
        self.n_layer = td.n_layer + md.n_layer
        if td.n_head != md.n_head:
            raise ValueError(
                "engine KV geometry is uniform across layers: text and "
                f"fusion head counts must match ({td.n_head} != {md.n_head})"
            )
        self.n_head = td.n_head
        self.head_dim = td.embedding_dim // td.n_head
        # token position budget: CLS occupies the last position slot
        self.max_positions = (
            td.num_positions - 1 if td.embed_cls else td.num_positions
        )
        self.vocab_size = md.output_dim
        # mirrors CoCaTextDecoder.setup (models/coca/text_decoder.py)
        self.text_stack = TransformerDecoder(
            n_layer=td.n_layer,
            d_model=td.embedding_dim,
            n_head=td.n_head,
            dim_feedforward=td.dim_feedforward,
            dropout=td.dropout,
            activation=td.activation,
            layer_norm_eps=td.layer_norm_eps,
            norm_first=td.norm_first,
            use_cross_attention=False,
            dtype=td.dtype,
            param_dtype=td.param_dtype,
        )
        # mirrors CoCaMultimodalDecoder.__call__ (multimodal_decoder.py)
        self.mm_stack = TransformerDecoder(
            n_layer=md.n_layer,
            d_model=md.text_embedding_dim,
            n_head=md.n_head,
            dim_feedforward=md.dim_feedforward,
            dropout=md.dropout,
            activation=md.activation,
            layer_norm_eps=md.layer_norm_eps,
            norm_first=md.norm_first,
            use_cross_attention=True,
            dim_kv=md.visual_embedding_dim,
            final_layer_norm_eps=md.final_layer_norm_eps,
            dtype=md.dtype,
            param_dtype=md.param_dtype,
        )
        self.dtype = td.dtype

    def apply(
        self,
        variables,
        tokens: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,
        past_key_values: Optional[tuple] = None,
        cache_index: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
        conditioning: Optional[jnp.ndarray] = None,
    ):
        p = variables["params"]
        emb = p["text_decoder"]["embeddings"]
        b, s = tokens.shape
        pos = (
            jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
            if positions is None
            else positions
        )
        pos = jnp.clip(pos, 0, self.max_positions - 1)
        x = (
            jnp.asarray(emb["token_embeddings"]["embedding"])[tokens]
            + jnp.asarray(emb["position_embeddings"])[pos]
        ).astype(self.dtype)

        n_text = self.n_text_layers
        text_pkv = (
            past_key_values[:n_text] if past_key_values is not None else None
        )
        mm_pkv = (
            past_key_values[n_text:] if past_key_values is not None else None
        )
        is_causal = attention_mask is None
        t_out = self.text_stack.apply(
            {"params": p["text_decoder"]["transformer_decoder"]},
            x,
            attention_mask=attention_mask,
            past_key_values=text_pkv,
            use_cache=use_cache,
            is_causal=is_causal,
            cache_index=cache_index,
        )
        m_out = self.mm_stack.apply(
            {"params": p["multimodal_decoder"]["transformer_decoder"]},
            t_out.last_hidden_state,
            encoder_hidden_states=conditioning,
            attention_mask=attention_mask,
            past_key_values=mm_pkv,
            use_cache=use_cache,
            is_causal=is_causal,
            cache_index=cache_index,
        )
        kernel = p["multimodal_decoder"]["output_projection"]["kernel"]
        logits = m_out.last_hidden_state @ jnp.asarray(kernel).astype(
            m_out.last_hidden_state.dtype
        )
        if use_cache:
            return logits, tuple(t_out.current_key_values) + tuple(
                m_out.current_key_values
            )
        return logits


def _captioning_geometry(model: CoCaModel) -> Tuple[int, int]:
    """(n_ctx, dim) of the captioning image tokens the vision pooler
    emits — the conditioning row shape."""
    pooler = model.vision_pooler
    if isinstance(pooler, CascadedAttentionPooler):
        first = pooler.poolers[0]
        return first.n_queries, first.output_embed_dim
    return pooler.n_queries - 1, pooler.output_embed_dim


class CoCaCaptionServer:
    """Continuous-batching image captioning.

    ``encode(images)`` → per-image (captioning tokens, contrastive
    embedding); ``submit(prompt, image=...)`` queues a caption request
    riding the engine's conditioning buffer; ``run()`` drains.

    Args:
        model: a ``CoCaModel`` (its captioning path must project to the
            vocab, i.e. ``multimodal_output_projection_dim`` set).
        variables: its variable collections.
        n_slots / engine_kwargs: engine pool geometry. ``max_len`` is
            fixed by the text position table (``num_text_positions``).
    """

    def __init__(
        self,
        model: CoCaModel,
        variables,
        n_slots: int = 8,
        **engine_kwargs: Any,
    ):
        self.model = model
        self.variables = variables
        self.adapter = CoCaCaptionAdapter(model)
        n_ctx, cond_dim = _captioning_geometry(model)
        self.engine = InferenceEngine(
            self.adapter,
            variables,
            n_slots=n_slots,
            max_len=self.adapter.max_positions,
            n_layer=self.adapter.n_layer,
            n_head=self.adapter.n_head,
            head_dim=self.adapter.head_dim,
            conditioning_spec=jax.ShapeDtypeStruct(
                (n_ctx, cond_dim), jnp.float32
            ),
            **engine_kwargs,
        )

    @partial(jax.jit, static_argnums=0)
    def _encode(self, variables, images):
        p = variables["params"]
        m = self.model
        vout = m.vision_encoder.apply({"params": p["vision_encoder"]}, images)
        if isinstance(vout, TransformerOutput):
            image_embeddings = vout.last_hidden_state
        elif isinstance(vout, tuple):
            image_embeddings = vout[0]
        else:
            image_embeddings = vout
        pooled = m.vision_pooler.apply(
            {"params": p["vision_pooler"]}, image_embeddings
        )
        if isinstance(pooled, (list, tuple)):
            captioning, contrastive = pooled
            contrastive = contrastive[:, 0]
        else:
            contrastive = pooled[:, 0]
            captioning = pooled[:, 1:]
        contrastive = _l2norm(
            m.vision_proj.apply({"params": p["vision_proj"]}, contrastive)
        )
        return captioning, contrastive

    def encode(self, images) -> Tuple[np.ndarray, np.ndarray]:
        """One jitted vision forward for a batch of images: per-image
        (captioning tokens (b, n_ctx, d), contrastive embedding (b, d))."""
        cap, con = self._encode(self.variables, jnp.asarray(images))
        return np.asarray(cap), np.asarray(con)

    def submit(
        self,
        prompt: Sequence[int],
        image=None,
        image_tokens: Optional[np.ndarray] = None,
        request_id: Any = None,
        max_new_tokens: Optional[int] = None,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        eos_id: Optional[int] = None,
        on_token: Optional[Any] = None,
    ) -> None:
        """Queue a caption request: ``prompt`` is the BOS/prompt token ids,
        ``image`` a single image (encoded here) or ``image_tokens`` its
        precomputed captioning tokens (from ``encode``, one row)."""
        if (image is None) == (image_tokens is None):
            raise ValueError("pass exactly one of image / image_tokens")
        if image is not None:
            image_tokens = self.encode(np.asarray(image)[None])[0][0]
        budget = self.adapter.max_positions - len(prompt)
        if max_new_tokens is None:
            max_new_tokens = budget
        if max_new_tokens > budget:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds the text position table ({self.adapter.max_positions})"
            )
        self.engine.submit(
            Request(
                list(prompt),
                max_new_tokens=max_new_tokens,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                eos_id=eos_id,
                request_id=request_id,
                on_token=on_token,
                conditioning=np.asarray(image_tokens, np.float32),
            )
        )

    def run(self) -> List:
        return self.engine.run()
