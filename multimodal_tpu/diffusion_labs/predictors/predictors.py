"""Prediction-target converters (noise / x0 / v).

Parity with reference ``diffusion_labs/predictors/`` (Predictor protocol,
NoisePredictor, TargetPredictor, VPredictor).
"""

from __future__ import annotations

from typing import Callable, Optional, Protocol, runtime_checkable

import jax.numpy as jnp

from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
)


@runtime_checkable
class Predictor(Protocol):
    schedule: DiscreteGaussianSchedule
    clamp_func: Optional[Callable]

    def predict_x0(self, prediction, xt, t): ...

    def predict_noise(self, prediction, xt, t): ...


class NoisePredictor:
    """Model predicts epsilon."""

    def __init__(self, schedule: DiscreteGaussianSchedule, clamp_func: Optional[Callable] = None):
        self.schedule = schedule
        self.clamp_func = clamp_func

    def predict_x0(self, prediction, xt, t):
        x_coef = self.schedule("sqrt_recip_alphas_cumprod", t, xt.shape)
        e_coef = self.schedule("sqrt_recip_alphas_cumprod_minus_one", t, xt.shape)
        x0 = x_coef * xt - e_coef * prediction
        if self.clamp_func is not None:
            x0 = self.clamp_func(x0)
        return x0.astype(xt.dtype)

    def predict_noise(self, prediction, xt, t):
        return prediction


class TargetPredictor:
    """Model predicts x0 directly."""

    def __init__(self, schedule: DiscreteGaussianSchedule, clamp_func: Optional[Callable] = None):
        self.schedule = schedule
        self.clamp_func = clamp_func

    def predict_x0(self, prediction, xt, t):
        if self.clamp_func is not None:
            prediction = self.clamp_func(prediction)
        return prediction

    def predict_noise(self, prediction, xt, t):
        x_coef = self.schedule("sqrt_recip_alphas_cumprod", t, xt.shape)
        e_coef = self.schedule("sqrt_recip_alphas_cumprod_minus_one", t, xt.shape)
        x0 = self.predict_x0(prediction, xt, t)
        return ((x_coef * xt - x0) / e_coef).astype(xt.dtype)


class VPredictor:
    """Model predicts v = sqrt(a)·eps - sqrt(1-a)·x0 (Salimans & Ho 2022)."""

    def __init__(self, schedule: DiscreteGaussianSchedule, clamp_func: Optional[Callable] = None):
        self.schedule = schedule
        self.clamp_func = clamp_func

    def predict_x0(self, prediction, xt, t):
        x_coef = self.schedule("sqrt_alphas_cumprod", t, xt.shape)
        v_coef = self.schedule("sqrt_compliment_alphas_cumprod", t, xt.shape)
        x0 = x_coef * xt - v_coef * prediction
        if self.clamp_func is not None:
            x0 = self.clamp_func(x0)
        return x0.astype(xt.dtype)

    def predict_noise(self, prediction, xt, t):
        x_coef = self.schedule("sqrt_recip_alphas_cumprod", t, xt.shape)
        e_coef = self.schedule("sqrt_recip_alphas_cumprod_minus_one", t, xt.shape)
        x0 = self.predict_x0(prediction, xt, t)
        return ((x_coef * xt - x0) / e_coef).astype(xt.dtype)


def v_target(schedule: DiscreteGaussianSchedule, x0, noise, t):
    """Compute the v-prediction training target (transforms/v_transform.py)."""
    a = schedule("sqrt_alphas_cumprod", t, x0.shape)
    ca = schedule("sqrt_compliment_alphas_cumprod", t, x0.shape)
    return (a * noise - ca * x0).astype(x0.dtype)
