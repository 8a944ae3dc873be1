"""BLIP-2 stage-1 losses (ITC / ITM / ITG).

Parity with reference ``modules/losses/blip2_losses.py``
(compute_image_text_similarity:31, itc_loss:71, itg_loss:100, itm_loss:140,
Blip2Phase1Loss:258).

TPU-native re-expression:
  - cross-rank gathers via ``all_gather_with_backprop_type`` inside shard_map
    (GLOBAL for image embeds, NONE for features/ids, reference :44-49,176-187);
  - hard-negative mining via ``jax.random.categorical`` over log-weights with
    the local diagonal masked (replaces the per-row host multinomial loop);
  - the ITM Q-Former re-run goes through ``BLIP2.itm_forward`` applied with
    the model's variables (pure call, no module mutation).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.blip2.blip2 import BLIP2, Blip2Output
from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
    cross_entropy,
)
from multimodal_tpu.parallel.collectives import (
    BackpropType,
    all_gather_with_backprop_type,
    get_axis_index,
)


class Blip2Stage1Losses(NamedTuple):
    image_text_contrastive_loss: jnp.ndarray
    image_text_matching_loss: jnp.ndarray
    image_captioning_loss: jnp.ndarray
    total_loss: jnp.ndarray


def compute_image_text_similarity(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    temp: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max-over-query-token similarities (reference :31-68)."""
    image_features_all = all_gather_with_backprop_type(
        image_features, axis_name, BackpropType.NONE
    )
    text_features_all = all_gather_with_backprop_type(
        text_features, axis_name, BackpropType.NONE
    )
    # (b_local, num_query, d) x (b_global, d) -> (b_local, b_global, num_query)
    sim_q2t = jnp.einsum("bqd,gd->bgq", image_features, text_features_all)
    sim_i2t = jnp.max(sim_q2t, axis=-1) / temp

    # (b_local, d) x (b_global, num_query, d) -> (b_local, b_global, num_query)
    sim_t2q = jnp.einsum("bd,gqd->bgq", text_features, image_features_all)
    sim_t2i = jnp.max(sim_t2q, axis=-1) / temp
    return sim_i2t, sim_t2i


def itc_loss(
    sim_i2t: jnp.ndarray,
    sim_t2i: jnp.ndarray,
    label_smoothing: float = 0.1,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    local_bs = sim_i2t.shape[0]
    targets = get_axis_index(axis_name) * local_bs + jnp.arange(local_bs)
    return (
        cross_entropy(sim_i2t, targets, label_smoothing)
        + cross_entropy(sim_t2i, targets, label_smoothing)
    ) / 2


def itg_loss(
    input_ids: jnp.ndarray,
    prediction_scores: jnp.ndarray,
    decoder_bos_token_id: int,
    pad_token_id: int,
    vocab_size: int,
    label_smoothing: float = 0.1,
) -> jnp.ndarray:
    """Causal captioning loss with BOS-replaced CLS and pad -> ignore."""
    decoder_input_ids = input_ids.at[:, 0].set(decoder_bos_token_id)
    labels = jnp.where(decoder_input_ids == pad_token_id, -100, decoder_input_ids)
    scores = prediction_scores[:, :-1, :].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    label_logp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = -(1 - label_smoothing) * label_logp - label_smoothing * jnp.mean(logp, axis=-1)
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def itm_loss(
    blip2_module: BLIP2,
    blip2_variables: Any,
    itm_head_apply,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    image_embeds: jnp.ndarray,
    sim_i2t: jnp.ndarray,
    sim_t2i: jnp.ndarray,
    rng: jax.Array,
    axis_name: Optional[str] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Hard-negative ITM over a 3x batch (pos, neg, neg) (reference :140-255)."""
    local_bs = image_embeds.shape[0]
    ids_all = all_gather_with_backprop_type(input_ids, axis_name, BackpropType.NONE)
    atts_all = all_gather_with_backprop_type(attention_mask, axis_name, BackpropType.NONE)
    image_embeds_all = all_gather_with_backprop_type(
        image_embeds, axis_name, BackpropType.GLOBAL
    )

    rank = get_axis_index(axis_name)
    offset = rank * local_bs
    col = jnp.arange(sim_t2i.shape[1])[None, :]
    row = jnp.arange(local_bs)[:, None]
    own_diag = col == (offset + row)

    logw_t2i = jnp.where(own_diag, -jnp.inf, jax.nn.log_softmax(sim_t2i, axis=1))
    logw_i2t = jnp.where(own_diag, -jnp.inf, jax.nn.log_softmax(sim_i2t, axis=1))
    rng_i, rng_t = jax.random.split(rng)
    neg_img_idx = jax.random.categorical(rng_i, jax.lax.stop_gradient(logw_t2i), axis=1)
    neg_txt_idx = jax.random.categorical(rng_t, jax.lax.stop_gradient(logw_i2t), axis=1)

    image_embeds_neg = image_embeds_all[neg_img_idx]
    text_ids_neg = ids_all[neg_txt_idx]
    text_atts_neg = atts_all[neg_txt_idx]

    text_ids_3x = jnp.concatenate([input_ids, input_ids, text_ids_neg], axis=0)
    text_atts_3x = jnp.concatenate([attention_mask, attention_mask, text_atts_neg], axis=0)
    image_embeds_3x = jnp.concatenate([image_embeds, image_embeds_neg, image_embeds], axis=0)

    vl_embeddings = blip2_module.apply(
        blip2_variables, text_ids_3x, text_atts_3x, image_embeds_3x,
        deterministic, method=BLIP2.itm_forward,
    )
    itm_logits = jnp.mean(itm_head_apply(vl_embeddings), axis=1)  # mean over queries
    itm_labels = jnp.concatenate(
        [jnp.ones(local_bs, jnp.int32), jnp.zeros(2 * local_bs, jnp.int32)]
    )
    return cross_entropy(itm_logits, itm_labels)


class Blip2Phase1Loss(nn.Module):
    """Holds the ITM head + temperature (reference :258)."""

    dim_q: int = 768
    enable_itc: bool = True
    enable_itm: bool = True
    enable_itg: bool = True
    temp: float = 0.07
    label_smoothing: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        if not (self.enable_itc or self.enable_itm or self.enable_itg):
            raise ValueError(
                "All the loss tasks are disabled, please set at least one of them."
            )
        self.itm_head = nn.Dense(2, dtype=self.dtype, param_dtype=self.param_dtype)
        self.temp_param = self.param(
            "temp", nn.initializers.constant(self.temp), (), jnp.float32
        )

    def __call__(self, vl_embeddings: jnp.ndarray) -> jnp.ndarray:
        return self.itm_head(vl_embeddings)

    def temperature(self) -> jnp.ndarray:
        return self.temp_param


def blip2_phase1_loss(
    loss_module: Blip2Phase1Loss,
    loss_variables: Any,
    blip2_module: BLIP2,
    blip2_variables: Any,
    model_output: Blip2Output,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    rng: jax.Array,
    decoder_bos_token_id: int = 30522,
    pad_token_id: int = 0,
    vocab_size: int = 30523,
    axis_name: Optional[str] = None,
    deterministic: bool = True,
) -> Blip2Stage1Losses:
    """Orchestrate the three stage-1 objectives (reference :303-357)."""
    temp = loss_module.apply(loss_variables, method=Blip2Phase1Loss.temperature)
    sim_i2t, sim_t2i = compute_image_text_similarity(
        model_output.image_features, model_output.text_features, temp, axis_name
    )

    zero = jnp.asarray(0.0)
    loss_itm = zero
    if loss_module.enable_itm:
        loss_itm = itm_loss(
            blip2_module, blip2_variables,
            lambda vl: loss_module.apply(loss_variables, vl),
            input_ids, attention_mask,
            model_output.image_embeddings, sim_i2t, sim_t2i, rng,
            axis_name=axis_name, deterministic=deterministic,
        )
    loss_itg = zero
    if loss_module.enable_itg:
        loss_itg = itg_loss(
            input_ids, model_output.prediction_scores, decoder_bos_token_id,
            pad_token_id, vocab_size, loss_module.label_smoothing,
        )
    loss_itc = zero
    if loss_module.enable_itc:
        loss_itc = itc_loss(sim_i2t, sim_t2i, loss_module.label_smoothing, axis_name)

    return Blip2Stage1Losses(
        image_text_contrastive_loss=loss_itc,
        image_text_matching_loss=loss_itm,
        image_captioning_loss=loss_itg,
        total_loss=loss_itc + loss_itm + loss_itg,
    )
