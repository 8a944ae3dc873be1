"""DALL-E 2 decoder builder.

Parity with reference ``diffusion_labs/models/dalle2/dalle2_decoder.py:19``:
ADM U-Net conditioned on CLIP image embeddings, wrapped in classifier-free
guidance and a DDPM sampler.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

from multimodal_tpu.diffusion_labs.adapters.cfguidance import CFGuidance
from multimodal_tpu.diffusion_labs.models.adm_unet import ADMUNet
from multimodal_tpu.diffusion_labs.predictors.predictors import NoisePredictor
from multimodal_tpu.diffusion_labs.samplers.ddpm import DDPModule
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
    cosine_beta_schedule,
)


def dalle2_decoder(
    timesteps: int = 1000,
    guidance: float = 7.0,
    clip_embed_dim: int = 768,
    clip_embed_name: str = "clip_image",
    predict_variance_value: bool = True,
    image_channels: int = 3,
    channels_per_layer: Sequence[int] = (128, 256, 256, 256),
    dim_res_cond: int = 512,
    eval_steps: Optional[Any] = None,
    clamp_func=None,
    **unet_kwargs: Any,
) -> DDPModule:
    unet = ADMUNet(
        in_channels=image_channels,
        out_channels=image_channels,
        embed_name=clip_embed_name,
        dim_attn_cond=unet_kwargs.pop("dim_attn_cond", dim_res_cond),
        channels_per_layer=channels_per_layer,
        dim_res_cond=dim_res_cond,
        predict_variance_value=predict_variance_value,
        **unet_kwargs,
    )
    guided = CFGuidance(
        model=unet,
        dim_cond={clip_embed_name: clip_embed_dim},
        guidance=guidance,
    )
    schedule = DiscreteGaussianSchedule(cosine_beta_schedule(timesteps))
    predictor = NoisePredictor(schedule, clamp_func)
    return DDPModule(
        model=guided,
        schedule=schedule,
        predictor=predictor,
        eval_steps=eval_steps,
    )
