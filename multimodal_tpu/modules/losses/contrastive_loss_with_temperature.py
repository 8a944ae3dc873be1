"""Global-batch contrastive loss with learnable temperature (CLIP ITC).

Parity with reference
``modules/losses/contrastive_loss_with_temperature.py`` (functional:50,
class:121, _gather_embeddings_and_labels:26): local×global logits, symmetric
cross entropy with labels offset by ``rank * local_batch``, learnable
``logit_scale`` clamped to ``[ln 1, ln 100]``, optional boolean sample mask,
label smoothing.

TPU-native distribution: pass ``axis_name`` when running inside
``shard_map`` over a mesh axis — embeddings are all-gathered over ICI with
the requested ``BackpropType`` gradient semantics and labels are offset by
``jax.lax.axis_index``. With ``axis_name=None`` (single device, or under
plain GSPMD jit where the global batch is already visible) it is the local
computation. The logit-scale clamp is done in the loss (functionally) rather
than by in-place param mutation; pair with an optax projection if exact
post-update clamping is desired.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.parallel.collectives import (
    BackpropType,
    all_gather_with_backprop_type,
    get_axis_index,
)

DEFAULT_LOGIT_SCALE = math.log(1 / 0.07)
DEFAULT_LOGIT_SCALE_MIN = math.log(1.0)
DEFAULT_LOGIT_SCALE_MAX = math.log(100.0)


class ContrastiveLossOutput(NamedTuple):
    loss: jnp.ndarray
    logits_a: jnp.ndarray
    logits_b: jnp.ndarray
    loss_a: jnp.ndarray
    loss_b: jnp.ndarray


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean cross entropy over rows; integer labels; optional smoothing and
    per-row weights (0/1 mask)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    label_logp = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        # torch semantics: (1-eps)*nll + eps * mean over classes
        nll = -(1.0 - label_smoothing) * label_logp - label_smoothing * jnp.mean(logp, axis=-1)
    else:
        nll = -label_logp
    if weights is not None:
        w = weights.astype(nll.dtype)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(nll)


def contrastive_loss_with_temperature(
    embeddings_a: jnp.ndarray,
    embeddings_b: jnp.ndarray,
    logit_scale: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    backprop_type: BackpropType = BackpropType.GLOBAL,
    axis_name: Optional[str] = None,
    label_smoothing: float = 0.0,
) -> ContrastiveLossOutput:
    """Functional symmetric InfoNCE with temperature.

    ``mask`` is a per-local-sample boolean; masked-out rows are excluded from
    both directions of the loss (implemented as 0-weighted rows — jit-safe,
    unlike the reference's boolean indexing).
    """
    temperature = jnp.exp(logit_scale)

    a_global = all_gather_with_backprop_type(embeddings_a, axis_name, backprop_type)
    b_global = all_gather_with_backprop_type(embeddings_b, axis_name, backprop_type)
    local_bs = embeddings_a.shape[0]
    labels = get_axis_index(axis_name) * local_bs + jnp.arange(local_bs)

    logits_a = jnp.matmul(
        embeddings_a, b_global.T, preferred_element_type=jnp.float32
    ) * temperature
    logits_b = jnp.matmul(
        embeddings_b, a_global.T, preferred_element_type=jnp.float32
    ) * temperature

    weights = mask.astype(jnp.float32) if mask is not None else None
    loss_a = cross_entropy(logits_a, labels, label_smoothing, weights)
    loss_b = cross_entropy(logits_b, labels, label_smoothing, weights)
    loss = (loss_a + loss_b) / 2
    return ContrastiveLossOutput(loss, logits_a, logits_b, loss_a, loss_b)


class ContrastiveLossWithTemperature(nn.Module):
    """Module wrapper owning the learnable ``logit_scale``.

    Parity: reference ``contrastive_loss_with_temperature.py:121``. The scale
    is clamped functionally inside the forward.
    """

    logit_scale_init: float = DEFAULT_LOGIT_SCALE
    logit_scale_min: Optional[float] = DEFAULT_LOGIT_SCALE_MIN
    logit_scale_max: Optional[float] = DEFAULT_LOGIT_SCALE_MAX

    @nn.compact
    def __call__(
        self,
        embeddings_a: jnp.ndarray,
        embeddings_b: jnp.ndarray,
        backprop_type: BackpropType = BackpropType.GLOBAL,
        axis_name: Optional[str] = None,
        label_smoothing: float = 0.0,
        mask: Optional[jnp.ndarray] = None,
        return_output: bool = False,
    ):
        if self.logit_scale_min is None and self.logit_scale_max is None:
            raise ValueError(
                "Only one of `logit_scale_min` and `logit_scale_max` can be None."
            )
        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(self.logit_scale_init),
            (),
            jnp.float32,
        )
        logit_scale = jnp.clip(logit_scale, self.logit_scale_min, self.logit_scale_max)
        out = contrastive_loss_with_temperature(
            embeddings_a, embeddings_b, logit_scale,
            mask=mask, backprop_type=backprop_type, axis_name=axis_name,
            label_smoothing=label_smoothing,
        )
        return out if return_output else out.loss
