from multimodal_tpu.diffusion_labs.utils import DiffusionOutput
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
)
from multimodal_tpu.diffusion_labs.predictors.predictors import (
    NoisePredictor,
    TargetPredictor,
    VPredictor,
)
from multimodal_tpu.diffusion_labs.samplers.ddpm import DDPModule
from multimodal_tpu.diffusion_labs.samplers.ddim import DDIModule

__all__ = [
    "DiffusionOutput",
    "DiscreteGaussianSchedule",
    "cosine_beta_schedule",
    "linear_beta_schedule",
    "quadratic_beta_schedule",
    "sigmoid_beta_schedule",
    "NoisePredictor",
    "TargetPredictor",
    "VPredictor",
    "DDPModule",
    "DDIModule",
]
