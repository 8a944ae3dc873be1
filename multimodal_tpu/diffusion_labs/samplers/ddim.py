"""DDIM sampler.

Parity with reference ``diffusion_labs/samplers/ddim.py`` (DDIModule:19):
deterministic/eta-scaled implicit sampling (Song et al. eq. 12), reverse
loop as one ``lax.scan`` over (step, next_step) pairs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
)
from multimodal_tpu.diffusion_labs.utils import DiffusionOutput


class DDIModule(nn.Module):
    model: nn.Module
    schedule: DiscreteGaussianSchedule
    predictor: Any
    eval_steps: Optional[Any] = None
    eta: float = 1.0
    rng_collection: str = "diffusion"

    def remove_noise(self, xt, c, cur_step, next_step, rng):
        alpha_bar = self.schedule("alphas_cumprod", cur_step, xt.shape)
        alpha_bar_next = self.schedule("alphas_cumprod", next_step, xt.shape)
        alpha_bar_next_sqrt = self.schedule("sqrt_alphas_cumprod", next_step, xt.shape)

        out = self.model(xt, cur_step, c)
        pred = out.prediction
        x0 = self.predictor.predict_x0(pred, xt, cur_step)
        pred_noise = self.predictor.predict_noise(pred, xt, cur_step)
        noise = self.schedule.sample_noise(rng, xt)

        sigma = self.eta * jnp.sqrt(
            (1 - alpha_bar / alpha_bar_next) * (1 - alpha_bar_next) / (1 - alpha_bar)
        )
        # Song et al. equation 12
        xt_next = (
            x0 * alpha_bar_next_sqrt
            + sigma * noise
            + jnp.sqrt(jnp.maximum((1 - alpha_bar_next) - sigma ** 2, 0.0)) * pred_noise
        )
        return xt_next.astype(xt.dtype)

    def __call__(
        self,
        x: jnp.ndarray,
        timestep: Optional[jnp.ndarray] = None,
        conditional_inputs: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Union[DiffusionOutput, jnp.ndarray]:
        if not deterministic:
            if timestep is None:
                raise ValueError("Must provide a timestep value during training")
            return self.model(x, timestep, conditional_inputs)

        if rng is None:
            rng = self.make_rng(self.rng_collection)
        eval_steps = (
            np.arange(self.schedule.steps)
            if self.eval_steps is None
            else np.sort(np.asarray(self.eval_steps))
        )
        steps_desc = eval_steps[::-1]
        pairs = jnp.asarray(np.stack([steps_desc[:-1], steps_desc[1:]], axis=1))

        def body(carry, pair):
            x, rng = carry
            rng, sub = jax.random.split(rng)
            b = x.shape[0]
            t = jnp.full((b,), pair[0], jnp.int32)
            t1 = jnp.full((b,), pair[1], jnp.int32)
            x = self.remove_noise(x, conditional_inputs, t, t1, sub)
            return (x, rng), None

        if self.is_initializing():
            (x, _), _ = body((x, rng), pairs[0])
            return x
        (x, _), _ = jax.lax.scan(body, (x, rng), pairs)
        return x
