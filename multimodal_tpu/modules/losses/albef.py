"""ALBEF losses: ITC with momentum distillation + causal LM with distillation.

Parity with reference ``modules/losses/albef.py``
(ImageTextContrastiveLoss:14, CausalLanguageModelingLoss:80).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def image_text_contrastive_loss(
    image_to_text_sim: jnp.ndarray,
    text_to_image_sim: jnp.ndarray,
    image_to_text_sim_m: Optional[jnp.ndarray] = None,
    text_to_image_sim_m: Optional[jnp.ndarray] = None,
    sim_targets: Optional[jnp.ndarray] = None,
    alpha: float = 0.0,
) -> jnp.ndarray:
    """Soft-target symmetric contrastive loss with α-interpolated momentum
    distillation (reference albef.py:36-77)."""
    if sim_targets is None:
        sim_targets = jnp.eye(
            image_to_text_sim.shape[0], image_to_text_sim.shape[1]
        )
    if alpha != 0:
        if image_to_text_sim_m is None or text_to_image_sim_m is None:
            raise ValueError("momentum similarities required for non-zero alpha")
        i2t_targets = jax.lax.stop_gradient(
            alpha * jax.nn.softmax(image_to_text_sim_m, axis=1)
            + (1 - alpha) * sim_targets
        )
        t2i_targets = jax.lax.stop_gradient(
            alpha * jax.nn.softmax(text_to_image_sim_m, axis=1)
            + (1 - alpha) * sim_targets
        )
    else:
        i2t_targets = sim_targets
        t2i_targets = sim_targets

    loss_i2t = -jnp.mean(
        jnp.sum(jax.nn.log_softmax(image_to_text_sim, axis=1) * i2t_targets, axis=1)
    )
    loss_t2i = -jnp.mean(
        jnp.sum(jax.nn.log_softmax(text_to_image_sim, axis=1) * t2i_targets, axis=1)
    )
    return (loss_i2t + loss_t2i) / 2


class ImageTextContrastiveLoss:
    def __call__(self, *args, **kwargs):
        return image_text_contrastive_loss(*args, **kwargs)


def causal_language_modeling_loss(
    labels: jnp.ndarray,
    prediction_scores: jnp.ndarray,
    prediction_scores_m: Optional[jnp.ndarray] = None,
    mask_token_id: int = -100,
    alpha: float = 0.0,
) -> jnp.ndarray:
    """Next-token CE per sample (summed over sequence) with optional
    momentum distillation (reference albef.py:106-150). Returns (batch,)."""
    scores = prediction_scores[:, :-1, :].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != mask_token_id
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    mlm_loss = jnp.sum(nll * valid.astype(jnp.float32), axis=1)

    if alpha != 0:
        if prediction_scores_m is None:
            raise ValueError("prediction_scores_m cannot be None for non-zero alpha")
        scores_m = jax.lax.stop_gradient(prediction_scores_m[:, :-1, :].astype(jnp.float32))
        distill = -jnp.sum(logp * jax.nn.softmax(scores_m, axis=-1), axis=-1)
        distill = jnp.sum(distill * valid.astype(jnp.float32), axis=1)
        mlm_loss = (1 - alpha) * mlm_loss + alpha * distill
    return mlm_loss


class CausalLanguageModelingLoss:
    def __init__(self, mask_token_id: int = -100):
        self.mask_token_id = mask_token_id

    def __call__(self, labels, prediction_scores, prediction_scores_m=None, alpha=0.0):
        return causal_language_modeling_loss(
            labels, prediction_scores, prediction_scores_m,
            self.mask_token_id, alpha,
        )
