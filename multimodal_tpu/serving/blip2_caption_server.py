"""Continuous-batching image-captioning server for BLIP-2.

The reference builds all the machinery for image-conditioned generation —
``QformerForCLM`` reusing the query tokens' image-conditioned KV cache
(reference ``models/blip2/blip2.py:143-148``,
``qformer_model.py:103-108``) — but ships no sampler or decode loop for
it. This module completes the path and puts it behind
``serving.InferenceEngine``.

The mapping exploits BLIP-2's structure: TEXT positions never cross-attend
the image — only the 32 query tokens do (reference
``qformer_layers.py:84-89``: the cross-attention is applied to the query
slice alone); text sees the image exclusively through the query tokens'
cached self-attention K/V. So once the query KV is primed (one Q-Former
forward over query embeddings + image), caption decode is a PURE causal LM
over a cache whose first ``num_query_token`` rows are per-request primed
state — exactly the engine's ``kv_prefix_len`` feature:

  - ``prime()``: one jitted forward (frozen ViT -> ln_vision -> Q-Former
    over query embeds with cross-attention) returns each image's per-layer
    query KV rows (and its ITC image features, for free).
  - ``submit()`` hands those rows to the engine as ``Request.kv_prefix``;
    they are seeded into cache positions ``[0, P)`` at admission, the
    prompt prefills from ``P``, and decode attends them through the
    ordinary valid-prefix mask — matching the reference causal mask
    (text attends all queries + causal text,
    ``qformer_utils.py:get_causal_mask``).
  - The decode adapter runs only each layer's self-attention + TEXT
    feedforward branch (post-norm residuals) + the CLM prediction head;
    the query-branch modules (cross-attn, ``feedforward_query``) are
    never evaluated during decode, mirroring the reference CLM pass where
    ``query_length == 0``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.models.blip2.blip2 import BLIP2, _l2norm
from multimodal_tpu.models.blip2.qformer_model import (
    QformerModel,
    QformerPredictionHead,
)
from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
)
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm
from multimodal_tpu.serving.engine import InferenceEngine, Request


class Blip2CaptionAdapter:
    """Q-Former text-only CLM decode behind the engine's LM surface.

    A plain object (not a flax module): ``apply`` drives per-layer modules
    reconstructed with the exact hyperparameters ``QformerLayer.setup``
    uses, binding the ``qformer`` param subtrees unchanged. Engine cache
    positions count the ``num_query_token`` seeded rows, so text position
    embeddings index ``positions - P`` (the reference CLM's text positions
    start at 0 after the query prefix, ``qformer_layers.py:190-216``).
    """

    def __init__(self, blip2: BLIP2):
        q = blip2.qformer  # QformerForCLM
        self.query_length = blip2.num_query_token
        self.n_layer = q.num_hidden_layers
        self.n_head = q.num_heads
        self.head_dim = q.dim_q // q.num_heads
        self.vocab_size = q.vocab_size
        self.max_text_positions = q.max_position_embeddings
        common = dict(dtype=q.dtype, param_dtype=q.param_dtype)
        # mirrors QformerLayer.setup (models/blip2/qformer_layers.py)
        self.attention = MultiHeadAttentionWithCache(
            q.dim_q, q.dim_q, q.num_heads, q.attn_dropout, **common
        )
        self.layernorm = Fp32LayerNorm(
            eps=q.layer_norm_eps, param_dtype=q.param_dtype
        )
        self.feedforward = MLP(
            q.dim_q, q.dim_q, q.dim_feedforward, dropout=0.0,
            activation=q.activation, **common,
        )
        # mirrors QformerModel.setup / QformerForCLM.setup
        from multimodal_tpu.models.blip2.qformer_layers import (
            QformerEmbedding,
        )

        self.embeddings = QformerEmbedding(
            embedding_dim=q.dim_q,
            max_position_embeddings=q.max_position_embeddings,
            vocab_size=q.vocab_size,
            pad_token_id=q.pad_token_id,
            layer_norm_eps=q.layer_norm_eps,
            dropout=q.dropout,
            **common,
        )
        self.head = QformerPredictionHead(
            dim_q=q.dim_q,
            vocab_size=q.vocab_size,
            layer_norm_eps=q.layer_norm_eps,
            activation=q.activation,
            **common,
        )

    def apply(
        self,
        variables,
        tokens: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,
        past_key_values: Optional[tuple] = None,
        cache_index: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
    ):
        qp = variables["params"]["qformer"]
        pm = qp["model"]
        b, s = tokens.shape
        pos = (
            jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
            if positions is None
            else positions
        )
        text_pos = jnp.clip(
            pos - self.query_length, 0, self.max_text_positions - 1
        )
        x = self.embeddings.apply(
            {"params": pm["embeddings"]},
            input_ids=tokens,
            position_ids=text_pos,
        )
        new_kvs = []
        for i in range(self.n_layer):
            lp = pm["encoder"][f"layer_{i}"]
            pkv = (
                past_key_values[i] if past_key_values is not None else None
            )
            out = self.attention.apply(
                {"params": lp["self_attention"]},
                x, x, x,
                attn_mask=attention_mask,
                past_key_value=pkv,
                use_cache=True,
                is_causal=attention_mask is None,
                cache_index=cache_index,
            )
            new_kvs.append(out.past_key_value)
            # post-norm residuals, text feedforward branch only
            # (qformer_layers.py:116-120, the query_length == 0 path)
            x = self.layernorm.apply(
                {"params": lp["self_attn_layernorm"]}, out.attn_output + x
            )
            ff = self.feedforward.apply({"params": lp["feedforward"]}, x)
            x = self.layernorm.apply(
                {"params": lp["feedforward_layernorm"]}, ff + x
            )
        logits = self.head.apply({"params": qp["head"]}, x)
        if use_cache:
            return logits, tuple(new_kvs)
        return logits


class Blip2CaptionServer:
    """Continuous-batching BLIP-2 image captioning.

    ``prime(images)`` -> per-image (query KV rows, ITC image features);
    ``submit(prompt, kv_prefix=...)`` queues a caption request; ``run()``
    drains. ``max_text_len`` bounds prompt + generated tokens per request
    (the engine's cache is ``num_query_token + max_text_len`` positions).
    """

    def __init__(
        self,
        blip2: BLIP2,
        variables,
        n_slots: int = 8,
        max_text_len: int = 32,
        **engine_kwargs: Any,
    ):
        q = blip2.qformer
        if max_text_len > q.max_position_embeddings:
            raise ValueError(
                f"max_text_len ({max_text_len}) exceeds the text position "
                f"table ({q.max_position_embeddings})"
            )
        self.blip2 = blip2
        self.variables = variables
        self.adapter = Blip2CaptionAdapter(blip2)
        self.max_text_len = max_text_len
        p = self.adapter.query_length
        # mirrors QformerForCLM.setup's inner model, for priming
        self._qmodel = QformerModel(
            num_hidden_layers=q.num_hidden_layers,
            dim_q=q.dim_q,
            dim_feedforward=q.dim_feedforward,
            num_heads=q.num_heads,
            max_position_embeddings=q.max_position_embeddings,
            vocab_size=q.vocab_size,
            pad_token_id=q.pad_token_id,
            query_length=q.query_length,
            dim_kv=q.dim_kv,
            layer_norm_eps=q.layer_norm_eps,
            activation=q.activation,
            attn_dropout=q.attn_dropout,
            dropout=q.dropout,
            cross_attention_freq=q.cross_attention_freq,
            dtype=q.dtype,
            param_dtype=q.param_dtype,
        )
        self._vision_proj = nn.Dense(
            blip2.embedding_dim, dtype=blip2.dtype,
            param_dtype=blip2.param_dtype,
        )
        self.engine = InferenceEngine(
            self.adapter,
            variables,
            n_slots=n_slots,
            max_len=p + max_text_len,
            n_layer=self.adapter.n_layer,
            n_head=self.adapter.n_head,
            head_dim=self.adapter.head_dim,
            kv_prefix_len=p,
            **engine_kwargs,
        )

    @partial(jax.jit, static_argnums=0)
    def _prime(self, variables, images):
        p = variables["params"]
        image_embeds = self.blip2.apply(
            variables, images, method=BLIP2.encode_image
        )
        b = image_embeds.shape[0]
        query_tokens = jnp.broadcast_to(
            jnp.asarray(p["query_tokens"]).astype(self.blip2.dtype),
            (b, self.blip2.num_query_token, self.blip2.dim_q),
        )
        query_out, kvs = self._qmodel.apply(
            {"params": p["qformer"]["model"]},
            query_embeds=query_tokens,
            encoder_hidden_states=image_embeds,
            use_cache=True,
        )
        image_feats = _l2norm(
            self._vision_proj.apply({"params": p["vision_proj"]}, query_out)
        )
        return tuple(tuple(kv) for kv in kvs), image_feats

    def prime(self, images) -> Tuple[List[tuple], np.ndarray]:
        """One jitted forward for a batch of images. Returns
        ``(kv_prefixes, image_features)``: ``kv_prefixes[i]`` is image i's
        per-layer ``(k, v)`` rows (each ``(heads, P, head_dim)``) ready for
        ``submit``; ``image_features`` the ``(b, P, embed)`` normalized ITC
        features (reference ``blip2.py:112``)."""
        kvs, feats = self._prime(self.variables, jnp.asarray(images))
        kvs = jax.tree_util.tree_map(np.asarray, kvs)
        b = np.asarray(feats).shape[0]
        per_image = [
            tuple((k[i], v[i]) for k, v in kvs) for i in range(b)
        ]
        return per_image, np.asarray(feats)

    def submit(
        self,
        prompt: Sequence[int],
        image=None,
        kv_prefix: Optional[tuple] = None,
        request_id: Any = None,
        max_new_tokens: Optional[int] = None,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        eos_id: Optional[int] = None,
        on_token: Optional[Any] = None,
    ) -> None:
        """Queue a caption request: ``prompt`` the BOS/prompt token ids
        (callers wanting the reference's BOS convention pass
        ``[decoder_bos_token_id, ...]``), plus either ``image`` (a single
        image, primed here) or ``kv_prefix`` (one entry of ``prime()``)."""
        if (image is None) == (kv_prefix is None):
            raise ValueError("pass exactly one of image / kv_prefix")
        if image is not None:
            kv_prefix = self.prime(np.asarray(image)[None])[0][0]
        budget = self.max_text_len - len(prompt)
        if max_new_tokens is None:
            max_new_tokens = budget
        if max_new_tokens > budget:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new_tokens "
                f"({max_new_tokens}) exceeds max_text_len "
                f"({self.max_text_len})"
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
                kv_prefix=kv_prefix,
            )
        )

    def run(self) -> List:
        return self.engine.run()
