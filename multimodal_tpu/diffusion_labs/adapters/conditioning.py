"""Channel-conditioning adapters: inpainting and super-resolution.

Parity with reference ``diffusion_labs/modules/adapters/inpainting.py`` and
``super_resolution.py``: concatenate conditioning signals (masked image +
mask, or an upsampled low-res image) onto the model input channels.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.diffusion_labs.utils import DiffusionOutput


class InpaintingAdapter(nn.Module):
    """Concatenate [x, masked_image, mask] channel-wise before the model.

    Expects ``conditional_inputs['masked']`` (b,h,w,c) and
    ``conditional_inputs['mask']`` (b,h,w,1) (1 = hole).
    """

    model: nn.Module
    masked_field: str = "masked"
    mask_field: str = "mask"

    def __call__(
        self,
        x: jnp.ndarray,
        timestep: jnp.ndarray,
        conditional_inputs: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> DiffusionOutput:
        conditional_inputs = dict(conditional_inputs or {})
        masked = conditional_inputs.pop(self.masked_field, None)
        mask = conditional_inputs.pop(self.mask_field, None)
        if masked is None or mask is None:
            masked = jnp.zeros_like(x)
            mask = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        x_in = jnp.concatenate([x, masked.astype(x.dtype), mask.astype(x.dtype)], axis=-1)
        return self.model(x_in, timestep, conditional_inputs)


class SuperResolutionAdapter(nn.Module):
    """Concatenate an (upsampled) low-res conditioning image channel-wise.

    Expects ``conditional_inputs['low_res']`` either at target resolution or
    smaller (it is bilinearly upsampled).
    """

    model: nn.Module
    low_res_field: str = "low_res"

    def __call__(
        self,
        x: jnp.ndarray,
        timestep: jnp.ndarray,
        conditional_inputs: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> DiffusionOutput:
        conditional_inputs = dict(conditional_inputs or {})
        low_res = conditional_inputs.pop(self.low_res_field, None)
        if low_res is None:
            low_res = jnp.zeros_like(x)
        if low_res.shape[1:3] != x.shape[1:3]:
            low_res = jax.image.resize(
                low_res, x.shape[:3] + (low_res.shape[-1],), "bilinear"
            )
        x_in = jnp.concatenate([x, low_res.astype(x.dtype)], axis=-1)
        return self.model(x_in, timestep, conditional_inputs)
