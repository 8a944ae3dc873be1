"""FLAVA pretraining losses (MLM/MIM/ITM/MMM/global-contrastive).

Parity with reference ``modules/losses/flava.py`` (Pooler:84, TwoWayHead:100,
ITMLoss:111, MaskedPredictionHead:143, MaskedPredictionLoss:182,
FLAVAGlobalContrastiveLoss:241, FLAVAPretrainingLoss:296).

TPU-native re-expression of the reference's jit-hostile constructs:
  - masked-token boolean indexing (``hidden_states[masked_tokens]``) becomes
    full-sequence head computation + ignore-index-weighted cross entropy —
    static shapes, the vocab matmul stays on the MXU;
  - the ITM positive-pair row selection (``sequence[pos_mask]``) becomes
    per-sample 0/1 weights threaded into the MMM and contrastive terms.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.activation import get_activation
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm
from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
    contrastive_loss_with_temperature,
)
from multimodal_tpu.parallel.collectives import BackpropType


class ITMLossOutput(NamedTuple):
    logits: jnp.ndarray
    loss: jnp.ndarray


class MaskedPredictionLossOutput(NamedTuple):
    logits: jnp.ndarray
    loss: jnp.ndarray


class FLAVAGlobalContrastiveLossOutput(NamedTuple):
    text_embedding: jnp.ndarray
    image_embedding: jnp.ndarray
    logit_scale: jnp.ndarray
    image_logits: jnp.ndarray
    text_logits: jnp.ndarray
    image_loss: jnp.ndarray
    text_loss: jnp.ndarray
    loss: jnp.ndarray


class FLAVAPretrainingLossesCollection(NamedTuple):
    mmm_text_loss: Optional[jnp.ndarray] = None
    mmm_image_loss: Optional[jnp.ndarray] = None
    mim_loss: Optional[jnp.ndarray] = None
    mlm_loss: Optional[jnp.ndarray] = None
    itm_loss: Optional[jnp.ndarray] = None
    global_contrastive_loss: Optional[jnp.ndarray] = None

    def total(self) -> jnp.ndarray:
        parts = [l for l in self if l is not None]
        return sum(parts[1:], parts[0]) if parts else jnp.asarray(0.0)


class FLAVAPretrainingLossOutput(NamedTuple):
    losses: FLAVAPretrainingLossesCollection = FLAVAPretrainingLossesCollection()
    mlm_output: Optional[MaskedPredictionLossOutput] = None
    mim_output: Optional[MaskedPredictionLossOutput] = None
    mmm_text_output: Optional[MaskedPredictionLossOutput] = None
    mmm_image_output: Optional[MaskedPredictionLossOutput] = None
    itm_output: Optional[ITMLossOutput] = None
    global_contrastive_output: Optional[FLAVAGlobalContrastiveLossOutput] = None


def _masked_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = -1,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over positions where label != ignore_index (0 if none)."""
    valid = (labels != ignore_index)
    if sample_weights is not None:
        valid = jnp.logical_and(valid, sample_weights.astype(bool)[:, None])
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


class Pooler(nn.Module):
    """CLS-token dense+tanh pooler (reference flava.py:84)."""

    hidden_size: int = 768
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        first = hidden_states[:, 0]
        return jnp.tanh(
            nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(first)
        )


class TwoWayHead(nn.Module):
    hidden_size: int = 768
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled_output: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(2, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="seq_relationship")(pooled_output)


class ITMLoss(nn.Module):
    hidden_size: int = 768
    ignore_index: int = -1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, labels: Optional[jnp.ndarray]) -> ITMLossOutput:
        pooled = Pooler(self.hidden_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="pooler")(hidden_states)
        scores = TwoWayHead(self.hidden_size, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="cls")(pooled)
        if labels is None:
            loss = jnp.sum(pooled) * 0.0
        else:
            loss = _masked_cross_entropy(scores, labels, self.ignore_index)
        return ITMLossOutput(logits=scores, loss=loss)


class MaskedPredictionHead(nn.Module):
    hidden_size: int = 768
    vocab_size: int = 30522
    transform_act_fn: Union[str, Callable] = "gelu"
    layer_norm_eps: float = 1e-5
    use_fp32_layer_norm: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(hidden_states)
        h = get_activation(self.transform_act_fn)(h)
        if self.use_fp32_layer_norm:
            h = Fp32LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype,
                              name="layer_norm")(h)
        else:
            h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="layer_norm")(h)
        logits = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="decoder")(h)
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,), self.param_dtype)
        return logits + bias.astype(logits.dtype)


class MaskedPredictionLoss(nn.Module):
    hidden_size: int = 768
    vocab_size: int = 30522
    transform_act_fn: Union[str, Callable] = "gelu"
    layer_norm_eps: float = 1e-5
    ignore_index: int = -1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        masked_labels: Optional[jnp.ndarray] = None,
        sample_weights: Optional[jnp.ndarray] = None,
    ) -> MaskedPredictionLossOutput:
        prediction = MaskedPredictionHead(
            self.hidden_size, self.vocab_size, self.transform_act_fn,
            self.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="cls",
        )(hidden_states)
        if masked_labels is None:
            loss = jnp.sum(prediction) * 0.0
        else:
            loss = _masked_cross_entropy(
                prediction, masked_labels, self.ignore_index, sample_weights
            )
        return MaskedPredictionLossOutput(logits=prediction, loss=loss)


class FLAVAGlobalContrastiveLoss(nn.Module):
    logit_scale_init: float = math.log(1 / 0.07)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_sequence: jnp.ndarray,
        text_sequence: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        axis_name: Optional[str] = None,
    ) -> FLAVAGlobalContrastiveLossOutput:
        def l2norm(x):
            x32 = x.astype(jnp.float32)
            return x32 / jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True), 1e-12)

        text_embedding = l2norm(text_sequence)
        image_embedding = l2norm(image_sequence)
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.logit_scale_init), (), jnp.float32
        )
        logit_scale = jnp.clip(logit_scale, 0.0, 4.6052)
        out = contrastive_loss_with_temperature(
            image_embedding, text_embedding, logit_scale,
            mask=mask, backprop_type=BackpropType.GLOBAL, axis_name=axis_name,
        )
        return FLAVAGlobalContrastiveLossOutput(
            loss=out.loss,
            image_logits=out.logits_a,
            text_logits=out.logits_b,
            image_loss=out.loss_a,
            text_loss=out.loss_b,
            text_embedding=text_embedding,
            image_embedding=image_embedding,
            logit_scale=logit_scale,
        )


class FLAVAPretrainingLoss(nn.Module):
    """Orchestrates the 6 FLAVA objectives with weights.

    Sequence-slicing conventions mirror the reference (flava.py:370-484):
    image tokens inside the masked-multimodal sequence start at index 2
    (two CLS tokens — one from the mm encoder, one from the image encoder);
    text tokens are the trailing ``mlm_labels.shape[1]`` positions.
    """

    logit_scale_init: float = math.log(1 / 0.07)
    hidden_size: int = 768
    text_vocab_size: int = 30522
    image_vocab_size: int = 8192
    transform_act_fn: Union[str, Callable] = "gelu"
    layer_norm_eps: float = 1e-5
    ignore_index: int = -1
    mlm_weight: float = 1.0
    mim_weight: float = 1.0
    contrastive_loss_weight: float = 1.0
    mmm_image_loss_weight: float = 1.0
    mmm_text_loss_weight: float = 1.0
    itm_loss_weight: float = 1.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(
            transform_act_fn=self.transform_act_fn,
            layer_norm_eps=self.layer_norm_eps,
            ignore_index=self.ignore_index,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.contrastive_loss = FLAVAGlobalContrastiveLoss(
            logit_scale_init=self.logit_scale_init, dtype=self.dtype
        )
        self.mlm_loss = MaskedPredictionLoss(self.hidden_size, self.text_vocab_size, **kw)
        self.mim_loss = MaskedPredictionLoss(self.hidden_size, self.image_vocab_size, **kw)
        self.mmm_text_loss_module = MaskedPredictionLoss(
            self.hidden_size, self.text_vocab_size, **kw
        )
        self.mmm_image_loss_module = MaskedPredictionLoss(
            self.hidden_size, self.image_vocab_size, **kw
        )
        self.itm_loss_module = ITMLoss(
            self.hidden_size, self.ignore_index, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        image_sequence: Optional[jnp.ndarray] = None,
        text_sequence: Optional[jnp.ndarray] = None,
        image_masked_sequence: Optional[jnp.ndarray] = None,
        text_masked_sequence: Optional[jnp.ndarray] = None,
        multimodal_sequence: Optional[jnp.ndarray] = None,
        multimodal_masked_sequence: Optional[jnp.ndarray] = None,
        itm_labels: Optional[jnp.ndarray] = None,
        mim_labels: Optional[jnp.ndarray] = None,
        mlm_labels: Optional[jnp.ndarray] = None,
        projected_image_embeddings: Optional[jnp.ndarray] = None,
        projected_text_embeddings: Optional[jnp.ndarray] = None,
        axis_name: Optional[str] = None,
    ) -> FLAVAPretrainingLossOutput:
        if self.is_initializing():
            # Materialize every head's params regardless of which loss branches
            # this particular init call exercises (flax creates params lazily).
            dummy = jnp.zeros((1, 1, self.hidden_size), self.dtype)
            _ = self.mlm_loss(dummy, None)
            _ = self.mim_loss(dummy, None)
            _ = self.mmm_text_loss_module(dummy, None)
            _ = self.mmm_image_loss_module(dummy, None)
            _ = self.itm_loss_module(dummy, None)
            _ = self.contrastive_loss(
                jnp.zeros((1, 8), self.dtype), jnp.zeros((1, 8), self.dtype)
            )

        losses = {}
        outputs = {}
        pos_weights = None  # per-sample 0/1 weights replacing boolean row-select

        if (
            image_masked_sequence is not None
            and self.mim_weight > 0
            and multimodal_masked_sequence is None
        ):
            start = -mim_labels.shape[1] if mim_labels is not None else 1
            mim_out = self.mim_loss(image_masked_sequence[:, start:, :], mim_labels)
            mim_out = mim_out._replace(loss=mim_out.loss * self.mim_weight)
            outputs["mim_output"] = mim_out
            losses["mim_loss"] = mim_out.loss

        if (
            text_masked_sequence is not None
            and self.mlm_weight > 0
            and multimodal_masked_sequence is None
        ):
            start = -mlm_labels.shape[1] if mlm_labels is not None else 1
            mlm_out = self.mlm_loss(text_masked_sequence[:, start:, :], mlm_labels)
            mlm_out = mlm_out._replace(loss=mlm_out.loss * self.mlm_weight)
            outputs["mlm_output"] = mlm_out
            losses["mlm_loss"] = mlm_out.loss

        if multimodal_masked_sequence is not None and self.itm_loss_weight > 0:
            if itm_labels is not None:
                pos_pairs = itm_labels != 0
                # if no positive pair in batch, fall back to using all samples
                pos_weights = jnp.where(
                    jnp.any(pos_pairs), pos_pairs, jnp.ones_like(pos_pairs)
                ).astype(jnp.float32)
            else:
                pos_weights = jnp.ones(
                    (multimodal_masked_sequence.shape[0],), jnp.float32
                )
            itm_out = self.itm_loss_module(multimodal_masked_sequence, itm_labels)
            itm_out = itm_out._replace(loss=itm_out.loss * self.itm_loss_weight)
            outputs["itm_output"] = itm_out
            losses["itm_loss"] = itm_out.loss

        if multimodal_masked_sequence is not None and self.mmm_text_loss_weight > 0:
            start = (
                -mlm_labels.shape[1]
                if mlm_labels is not None
                else -(text_masked_sequence.shape[1] - 1)
            )
            mmm_text_out = self.mmm_text_loss_module(
                multimodal_masked_sequence[:, start:, :], mlm_labels, pos_weights
            )
            mmm_text_out = mmm_text_out._replace(
                loss=mmm_text_out.loss * self.mmm_text_loss_weight
            )
            outputs["mmm_text_output"] = mmm_text_out
            losses["mmm_text_loss"] = mmm_text_out.loss

        if multimodal_masked_sequence is not None and self.mmm_image_loss_weight > 0:
            total = (
                mim_labels.shape[1]
                if mim_labels is not None
                else (image_masked_sequence.shape[1] - 1)
            )
            # index 2: skip mm-encoder CLS + image-encoder CLS
            mmm_image_out = self.mmm_image_loss_module(
                multimodal_masked_sequence[:, 2 : 2 + total, :], mim_labels, pos_weights
            )
            mmm_image_out = mmm_image_out._replace(
                loss=mmm_image_out.loss * self.mmm_image_loss_weight
            )
            outputs["mmm_image_output"] = mmm_image_out
            losses["mmm_image_loss"] = mmm_image_out.loss

        if (
            projected_image_embeddings is not None
            and projected_text_embeddings is not None
            and self.contrastive_loss_weight > 0
        ):
            gc_out = self.contrastive_loss(
                projected_image_embeddings,
                projected_text_embeddings,
                mask=pos_weights.astype(bool) if pos_weights is not None else None,
                axis_name=axis_name,
            )
            gc_out = gc_out._replace(loss=gc_out.loss * self.contrastive_loss_weight)
            outputs["global_contrastive_output"] = gc_out
            losses["global_contrastive_loss"] = gc_out.loss

        return FLAVAPretrainingLossOutput(
            losses=FLAVAPretrainingLossesCollection(**losses), **outputs
        )
