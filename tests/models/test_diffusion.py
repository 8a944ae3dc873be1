"""Diffusion labs tests: schedule math, predictors, samplers, CFG, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_tpu.diffusion_labs.adapters.cfguidance import CFGuidance
from multimodal_tpu.diffusion_labs.losses import DiffusionHybridLoss, VLBLoss
from multimodal_tpu.diffusion_labs.models.adm_unet import ADMUNet
from multimodal_tpu.diffusion_labs.models.vae import variational_autoencoder
from multimodal_tpu.diffusion_labs.predictors.predictors import (
    NoisePredictor,
    TargetPredictor,
    VPredictor,
    v_target,
)
from multimodal_tpu.diffusion_labs.samplers.ddim import DDIModule
from multimodal_tpu.diffusion_labs.samplers.ddpm import DDPModule
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
)
from multimodal_tpu.diffusion_labs.transforms import (
    ComputeVTarget,
    InpaintingTransform,
    RandomDiffusionSteps,
    SuperResolutionTransform,
)
from multimodal_tpu.diffusion_labs.utils import DiffusionOutput

from tests.test_utils import assert_expected, rng

STEPS = 10


@pytest.fixture(scope="module")
def schedule():
    return DiscreteGaussianSchedule(linear_beta_schedule(STEPS, start=1e-4, end=0.2))


class TinyEps(nn.Module):
    """Trivial model predicting noise with learnable scale."""

    predict_variance: bool = False

    @nn.compact
    def __call__(self, x, t, c=None):
        s = self.param("s", nn.initializers.ones, ())
        pred = x * s * 0.1
        if self.predict_variance:
            return DiffusionOutput(prediction=pred, variance_value=jnp.ones_like(x) * 0.5)
        return DiffusionOutput(prediction=pred)


def test_schedule_quantities(schedule):
    betas = np.asarray(schedule.betas)
    alphas_cumprod = np.cumprod(1 - betas)
    t = jnp.arange(STEPS)
    got = schedule("alphas_cumprod", t, (STEPS, 1))
    assert_expected(got[:, 0], alphas_cumprod, rtol=1e-5)
    # interpolated fractional timestep
    mid = schedule("alphas_cumprod", jnp.asarray([1.5]), (1, 1))
    assert_expected(mid[0, 0], (alphas_cumprod[1] + alphas_cumprod[2]) / 2, rtol=1e-5)


def test_q_sample_roundtrip(schedule):
    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32))
    noise = schedule.sample_noise(rng(1), x0)
    t = jnp.asarray([3, 7])
    xt = schedule.q_sample(x0, noise, t)
    # NoisePredictor inverts q_sample exactly when given the true noise
    pred = NoisePredictor(schedule)
    x0_rec = pred.predict_x0(noise, xt, t)
    assert_expected(x0_rec, x0, rtol=1e-3, atol=1e-4)
    # TargetPredictor roundtrip for noise
    tp = TargetPredictor(schedule)
    noise_rec = tp.predict_noise(x0, xt, t)
    assert_expected(noise_rec, noise, rtol=1e-2, atol=1e-3)
    # v parameterization consistency
    v = v_target(schedule, x0, noise, t)
    vp = VPredictor(schedule)
    assert_expected(vp.predict_x0(v, xt, t), x0, rtol=1e-3, atol=1e-4)


def test_q_posterior_shapes(schedule):
    x0 = jnp.zeros((2, 4, 4, 3))
    xt = jnp.ones((2, 4, 4, 3))
    mean, logvar = schedule.q_posterior(x0, xt, jnp.asarray([0, 5]))
    assert mean.shape == xt.shape and logvar.shape == xt.shape


def test_ddpm_train_and_sample(schedule):
    model = TinyEps(predict_variance=True)
    sampler = DDPModule(model=model, schedule=schedule,
                        predictor=NoisePredictor(schedule))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32))
    t = jnp.asarray([2, 5])
    variables = sampler.init({"params": rng(0), "diffusion": rng(1)}, x, t,
                             deterministic=False)
    out = sampler.apply(variables, x, t, deterministic=False)
    assert out.prediction.shape == x.shape
    assert out.mean is not None and out.log_variance is not None

    sample = sampler.apply(variables, x, rngs={"diffusion": rng(2)})
    assert sample.shape == x.shape
    assert np.isfinite(np.asarray(sample)).all()


def test_ddpm_respaced_eval(schedule):
    sampler = DDPModule(model=TinyEps(), schedule=schedule,
                        predictor=NoisePredictor(schedule),
                        eval_steps=np.array([0, 4, 9]))
    x = jnp.ones((1, 4, 4, 3))
    variables = sampler.init({"params": rng(0), "diffusion": rng(1)}, x,
                             jnp.asarray([1]), deterministic=False)
    sample = sampler.apply(variables, x, rngs={"diffusion": rng(3)})
    assert np.isfinite(np.asarray(sample)).all()


def test_ddim_sample(schedule):
    sampler = DDIModule(model=TinyEps(), schedule=schedule,
                        predictor=NoisePredictor(schedule), eta=0.0)
    x = jnp.ones((1, 4, 4, 3))
    variables = sampler.init({"params": rng(0), "diffusion": rng(1)}, x,
                             jnp.asarray([1]), deterministic=False)
    s1 = sampler.apply(variables, x, rngs={"diffusion": rng(2)})
    s2 = sampler.apply(variables, x, rngs={"diffusion": rng(9)})
    # eta=0 -> deterministic sampling, independent of rng
    assert_expected(s1, s2)


def test_cfguidance_train_and_guided(schedule):
    model = TinyEps()
    cfg = CFGuidance(model=model, dim_cond={"clip": 8}, p=0.5, guidance=2.0)
    x = jnp.ones((2, 4, 4, 3))
    t = jnp.asarray([1, 2])
    cond = {"clip": jnp.ones((2, 8))}
    variables = cfg.init({"params": rng(0), "cfguidance": rng(1)}, x, t, cond,
                         deterministic=False)
    out_train = cfg.apply(variables, x, t, cond, deterministic=False,
                          rngs={"cfguidance": rng(2)})
    assert out_train.prediction.shape == x.shape
    out_eval = cfg.apply(variables, x, t, cond)
    assert out_eval.prediction.shape == x.shape
    # no conditions -> unguided path
    out_nocond = cfg.apply(variables, x, t, None)
    assert out_nocond.prediction.shape == x.shape


def test_losses(schedule):
    x0 = jnp.zeros((2, 4, 4, 3))
    xt = jnp.ones((2, 4, 4, 3))
    t = jnp.asarray([0, 5])
    mean, logvar = schedule.q_posterior(x0, xt, t)
    vlb = VLBLoss(schedule)(mean, logvar, x0, xt, t)
    assert np.isfinite(float(vlb))
    hybrid = DiffusionHybridLoss(schedule)(
        jnp.ones_like(x0), jnp.zeros_like(x0), mean, logvar, x0, xt, t
    )
    assert float(hybrid) > 1.0  # MSE term = 1


def test_transforms(schedule):
    batch = {"x": jnp.ones((2, 8, 8, 3))}
    out = RandomDiffusionSteps(schedule)(rng(0), batch)
    assert set(out) == {"x", "t", "noise", "xt"}
    assert out["t"].shape == (2,)
    out = ComputeVTarget(schedule)(out)
    assert out["v"].shape == (2, 8, 8, 3)
    out = SuperResolutionTransform(factor=2)(out)
    assert out["low_res"].shape == (2, 8, 8, 3)
    out = InpaintingTransform()(rng(1), out)
    assert out["mask"].shape == (2, 8, 8, 1)
    masked_frac = float(jnp.mean(out["mask"]))
    assert 0.0 < masked_frac < 0.5


@pytest.mark.slow
def test_adm_unet_forward():
    unet = ADMUNet(
        channels_per_layer=(8, 16), num_resize=1, num_res_per_layer=1,
        use_attention_for_layer=(False, True), dim_res_cond=16,
        predict_variance_value=True, time_embed_dim=8, num_heads=2,
        dim_attn_cond=16, embed_name="clip",
    )
    x = jnp.ones((1, 8, 8, 3))
    t = jnp.asarray([3])
    cond = {"clip": jnp.ones((1, 16))}
    params = unet.init(rng(0), x, t, cond)
    out = unet.apply(params, x, t, cond)
    assert out.prediction.shape == x.shape
    assert out.variance_value.shape == x.shape


def test_vae_roundtrip():
    vae = variational_autoencoder(channels=(8, 16), n_res=1, latent_channels=2)
    x = jnp.ones((1, 8, 8, 3))
    variables = vae.init({"params": rng(0), "vae": rng(1)}, x)
    recon, posterior = vae.apply(variables, x, rngs={"vae": rng(2)})
    assert recon.shape == x.shape
    assert posterior.mean.shape == (1, 4, 4, 2)  # one downsample
    kl = posterior.kl()
    assert kl.shape == (1,) and np.isfinite(float(kl[0]))


def test_dalle2_image_transform():
    from multimodal_tpu.diffusion_labs.transforms import Dalle2ImageTransform

    t = Dalle2ImageTransform(image_size=32)
    batch = {"x": np.random.RandomState(0).randint(0, 256, (2, 150, 200, 3), np.uint8)}
    out = t(batch)
    x = out["x"]
    assert x.shape == (2, 32, 32, 3)
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    # single image path
    single = t({"x": batch["x"][0]})["x"]
    assert single.shape == (32, 32, 3)
