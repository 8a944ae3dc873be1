"""Diffusion losses.

Parity with reference ``diffusion_labs/modules/losses/``
(DiffusionHybridLoss:15, VLBLoss:16): hybrid simple+VLB (detached mean) and
the discretized-Gaussian VLB.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
)


def _meanflat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x.reshape(x.shape[0], -1), axis=1)


def _normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def _discretized_gaussian_log_likelihood(x, mean, log_scale, thres=0.999, eps=1e-12):
    centered = x - mean
    inv_stdv = jnp.exp(-log_scale)
    cdf_plus = _approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = _approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, eps))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, eps))
    cdf_delta = cdf_plus - cdf_min
    log_cdf_delta = jnp.log(jnp.maximum(cdf_delta, eps))
    return jnp.where(
        x < -thres,
        log_cdf_plus,
        jnp.where(x > thres, log_one_minus_cdf_min, log_cdf_delta),
    )


class VLBLoss:
    """Variational-lower-bound loss (Improved DDPM)."""

    def __init__(self, schedule: DiscreteGaussianSchedule):
        self.schedule = schedule

    def __call__(self, pred_mean, pred_log_var, x0, xt, t) -> jnp.ndarray:
        mean, log_variance = self.schedule.q_posterior(x0, xt, t)
        nat = 1.0 / math.log(2.0)
        kl = _meanflat(_normal_kl(mean, log_variance, pred_mean, pred_log_var)) * nat
        decoder_nll = -_meanflat(
            _discretized_gaussian_log_likelihood(
                x0, mean=pred_mean, log_scale=0.5 * pred_log_var
            )
        ) * nat
        losses = jnp.where(t == 0, decoder_nll, kl)
        return jnp.mean(losses)


class DiffusionHybridLoss:
    """simple (MSE) + lambda * VLB with stop-gradient on the mean."""

    def __init__(
        self,
        schedule: DiscreteGaussianSchedule,
        simple_loss: Callable = None,
        lmbda: float = 0.001,
    ):
        self.simple_loss = simple_loss or (
            lambda a, b: jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
        )
        self.vlb_loss = VLBLoss(schedule)
        self.lmbda = lmbda

    def __call__(self, input, target, mean, log_variance, x0, xt, t) -> jnp.ndarray:
        return self.simple_loss(input, target) + self.lmbda * self.vlb_loss(
            jax.lax.stop_gradient(mean), log_variance, x0, xt, t
        )
