"""Discrete Gaussian diffusion schedule.

Parity with reference
``diffusion_labs/schedules/discrete_gaussian_schedule.py``
(DiscreteGaussianSchedule:16, beta schedules :270-322, q_sample:109,
q_posterior:123).

TPU-native design: the reference builds a lazy-property cache that mutates
itself; here every derived quantity is precomputed eagerly at construction
into plain jnp arrays (they're tiny) — the schedule is a static, hashable
container whose arrays become compile-time constants under jit. Noise/step
sampling take explicit rng keys.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class DiscreteGaussianSchedule:
    def __init__(self, betas: jnp.ndarray, variance_range_value: float = 0.0):
        if not 0.0 <= variance_range_value <= 1.0:
            raise ValueError("variance_range_value must be between 0 and 1")
        self.variance_range_value = variance_range_value
        self._set_betas(jnp.asarray(betas, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32))

    def _set_betas(self, betas: jnp.ndarray) -> None:
        self._betas = betas
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas, axis=0)
        alphas_cumprod_prev = jnp.concatenate(
            [jnp.ones((1,), betas.dtype), alphas_cumprod[:-1]]
        )
        q = {
            "betas": betas,
            "alphas": alphas,
            "alphas_cumprod": alphas_cumprod,
            "alphas_cumprod_prev": alphas_cumprod_prev,
            "sqrt_alphas_cumprod": jnp.sqrt(alphas_cumprod),
            "sqrt_compliment_alphas_cumprod": jnp.sqrt(1.0 - alphas_cumprod),
            "sqrt_recip_alphas_cumprod": jnp.sqrt(1.0 / alphas_cumprod),
            "sqrt_recip_alphas_cumprod_minus_one": jnp.sqrt(1.0 / alphas_cumprod - 1),
            "upper_posterior_log_variance": jnp.log(betas),
            "posterior_mean_x0_coef": betas * jnp.sqrt(alphas_cumprod_prev)
            / (1.0 - alphas_cumprod),
            "posterior_mean_xt_coef": (1.0 - alphas_cumprod_prev) * jnp.sqrt(alphas)
            / (1.0 - alphas_cumprod),
        }
        lpv = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        # first element is 0 (infinite log); replace with the second
        lpv = jnp.concatenate([lpv[1:2], lpv[1:]])
        q["lower_posterior_log_variance"] = jnp.log(lpv)
        self._quantities = q

    @property
    def betas(self) -> jnp.ndarray:
        return self._betas

    @betas.setter
    def betas(self, betas: jnp.ndarray) -> None:
        self._set_betas(jnp.asarray(betas, self._betas.dtype))

    @property
    def steps(self) -> int:
        return len(self._betas)

    def sample_noise(self, rng: jax.Array, x_like: jnp.ndarray) -> jnp.ndarray:
        return jax.random.normal(rng, x_like.shape, x_like.dtype)

    def sample_steps(self, rng: jax.Array, x_like: jnp.ndarray) -> jnp.ndarray:
        return jax.random.randint(rng, (x_like.shape[0],), 0, self.steps)

    def __call__(self, var_name: str, t: jnp.ndarray, shape) -> jnp.ndarray:
        """Gather schedule quantity at (possibly fractional) timesteps,
        broadcast-shaped for data of rank len(shape)."""
        arr = self._quantities[var_name].astype(jnp.float32)
        t = jnp.asarray(t)
        if jnp.issubdtype(t.dtype, jnp.floating):
            t_floor = jnp.floor(t)
            w = (t - t_floor)
            lo = arr[t_floor.astype(jnp.int32)]
            hi = arr[jnp.ceil(t).astype(jnp.int32)]
            out = lo + (hi - lo) * w
        else:
            out = arr[t]
        b = out.size
        return out.reshape((b,) + (1,) * (len(shape) - 1))

    def q_sample(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Forward diffusion q(xt | x0)."""
        x_coef = self("sqrt_alphas_cumprod", t, x0.shape)
        e_coef = self("sqrt_compliment_alphas_cumprod", t, x0.shape)
        return (x_coef * x0 + e_coef * noise).astype(x0.dtype)

    def q_posterior(
        self,
        x0: jnp.ndarray,
        xt: jnp.ndarray,
        t: jnp.ndarray,
        variance_range_value: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior mean and log-variance (Improved DDPM eq. 13/15)."""
        if variance_range_value is None:
            variance_range_value = jnp.ones_like(x0) * self.variance_range_value
        min_log = self("lower_posterior_log_variance", t, xt.shape)
        max_log = self("upper_posterior_log_variance", t, xt.shape)
        log_variance = variance_range_value * max_log + (1 - variance_range_value) * min_log
        mean = (
            self("posterior_mean_x0_coef", t, xt.shape) * x0
            + self("posterior_mean_xt_coef", t, xt.shape) * xt
        )
        return mean.astype(xt.dtype), log_variance.astype(xt.dtype)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jnp.ndarray:
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.asarray(np.clip(betas, 0, 0.999), jnp.float32)


def linear_beta_schedule(
    timesteps: int, start: Optional[float] = None, end: Optional[float] = None
) -> jnp.ndarray:
    scale = 1000 / timesteps
    beta_start = scale * 0.0001 if start is None else start
    beta_end = scale * 0.02 if end is None else end
    return jnp.asarray(np.linspace(beta_start, beta_end, timesteps), jnp.float32)


def quadratic_beta_schedule(
    timesteps: int, start: Optional[float] = None, end: Optional[float] = None
) -> jnp.ndarray:
    scale = 1000 / timesteps
    beta_start = scale * 0.0001 if start is None else start
    beta_end = scale * 0.02 if end is None else end
    return jnp.asarray(
        np.linspace(math.sqrt(beta_start), math.sqrt(beta_end), timesteps) ** 2,
        jnp.float32,
    )


def sigmoid_beta_schedule(
    timesteps: int, start: Optional[float] = None, end: Optional[float] = None
) -> jnp.ndarray:
    scale = 1000 / timesteps
    beta_start = scale * 0.0001 if start is None else start
    beta_end = scale * 0.02 if end is None else end
    xs = np.linspace(-6, 6, timesteps)
    return jnp.asarray(
        1 / (1 + np.exp(-xs)) * (beta_end - beta_start) + beta_start, jnp.float32
    )
