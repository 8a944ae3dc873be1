"""DDPM sampler.

Parity with reference ``diffusion_labs/samplers/ddpm.py`` (DDPModule:21):
train mode = single denoise prediction; eval mode = full reverse loop with a
separate respaced eval schedule (eval_steps / eval_steps_map, reference
:110-112) and t=0 noise masking (:136-139).

TPU-native: the reverse loop is ONE ``lax.scan`` over the eval steps (a
single compiled program), not a Python generator; sampling noise comes from
an explicit rng ('diffusion' stream by default).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.diffusion_labs.predictors.predictors import (
    NoisePredictor,
    TargetPredictor,
    VPredictor,
)
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
)
from multimodal_tpu.diffusion_labs.utils import DiffusionOutput


def _respaced(schedule: DiscreteGaussianSchedule, eval_steps: np.ndarray) -> DiscreteGaussianSchedule:
    """Strided-sampling schedule (Improved DDPM eq. 19)."""
    alphas_cumprod = np.asarray(schedule._quantities["alphas_cumprod"])[eval_steps]
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    betas = 1 - alphas_cumprod / alphas_cumprod_prev
    return DiscreteGaussianSchedule(jnp.asarray(betas, jnp.float32), schedule.variance_range_value)


class DDPModule(nn.Module):
    model: nn.Module
    schedule: DiscreteGaussianSchedule
    predictor: Any
    eval_steps: Optional[Any] = None  # np array / list of step indices
    rng_collection: str = "diffusion"

    def _eval_pieces(self):
        if self.eval_steps is None:
            eval_steps = np.arange(self.schedule.steps)
            return eval_steps, np.arange(self.schedule.steps), self.schedule, self.predictor
        eval_steps = np.sort(np.asarray(self.eval_steps))
        steps_map = np.zeros(self.schedule.steps, dtype=np.int64)
        steps_map[eval_steps] = np.arange(len(eval_steps))
        eval_schedule = _respaced(self.schedule, eval_steps)
        eval_predictor = type(self.predictor)(eval_schedule, self.predictor.clamp_func)
        return eval_steps, steps_map, eval_schedule, eval_predictor

    def predict_parameters(self, out: DiffusionOutput, xt, t, training: bool):
        pred, value = out.prediction, out.variance_value
        if training:
            schedule, predictor, timestep = self.schedule, self.predictor, t
        else:
            eval_steps, steps_map, schedule, predictor = self._eval_pieces()
            timestep = jnp.asarray(steps_map)[t]
        x0 = predictor.predict_x0(pred, xt, timestep)
        return schedule.q_posterior(x0, xt, timestep, value)

    def remove_noise(self, xt, t, c, rng):
        out = self.model(xt, t, c)
        mean, log_variance = self.predict_parameters(out, xt, t, training=False)
        noise = self.schedule.sample_noise(rng, xt)
        nonzero = (t != 0).astype(xt.dtype).reshape(-1, *([1] * (xt.ndim - 1)))
        return mean + nonzero * jnp.exp(0.5 * log_variance) * noise

    def __call__(
        self,
        x: jnp.ndarray,
        timestep: Optional[jnp.ndarray] = None,
        conditional_inputs: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Union[DiffusionOutput, jnp.ndarray]:
        if not deterministic:
            # training: single-step prediction
            if timestep is None:
                raise ValueError("Must provide a t value during training")
            out = self.model(x, timestep, conditional_inputs)
            if not isinstance(out, DiffusionOutput):
                raise TypeError("Model is expected to output a DiffusionOutput class")
            if out.variance_value is not None:
                mean, log_variance = self.predict_parameters(out, x, timestep, training=True)
                out = out.replace(mean=mean, log_variance=log_variance)
            return out

        # eval: full reverse diffusion as one lax.scan
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        eval_steps, _, _, _ = self._eval_pieces()
        steps_desc = jnp.asarray(eval_steps[::-1].copy())

        def body(carry, step):
            x, rng = carry
            rng, sub = jax.random.split(rng)
            t = jnp.full((x.shape[0],), step, jnp.int32)
            x = self.remove_noise(x, t, conditional_inputs, sub)
            return (x, rng), None

        if self.is_initializing():
            # during init run one step eagerly so params materialize
            (x, _), _ = body((x, rng), steps_desc[0])
            return x
        (x, _), _ = jax.lax.scan(body, (x, rng), steps_desc)
        return x
