"""Numerical parity for the diffusion_labs math vs the PyTorch reference:
beta schedules (discrete_gaussian_schedule.py:270-322), schedule quantities
and q_sample/q_posterior (:100-208), the three predictors
(predictors/{noise,target,v}_predictor.py), VLB + hybrid losses
(modules/losses/vlb_loss.py, diffusion_hybrid_loss.py), and the DDPM
respaced eval schedule (samplers/ddpm.py:85-97)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.diffusion_labs.losses import DiffusionHybridLoss, VLBLoss  # noqa: E402
from multimodal_tpu.diffusion_labs.predictors.predictors import (  # noqa: E402
    NoisePredictor,
    TargetPredictor,
    VPredictor,
    v_target,
)
from multimodal_tpu.diffusion_labs.samplers.ddpm import _respaced  # noqa: E402
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (  # noqa: E402
    DiscreteGaussianSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
)

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.diffusion_labs.modules.losses.diffusion_hybrid_loss import (  # noqa: E402
    DiffusionHybridLoss as RefHybridLoss,
)
from torchmultimodal.diffusion_labs.modules.losses.vlb_loss import (  # noqa: E402
    VLBLoss as RefVLBLoss,
)
from torchmultimodal.diffusion_labs.predictors.noise_predictor import (  # noqa: E402
    NoisePredictor as RefNoisePredictor,
)
from torchmultimodal.diffusion_labs.predictors.target_predictor import (  # noqa: E402
    TargetPredictor as RefTargetPredictor,
)
from torchmultimodal.diffusion_labs.predictors.v_predictor import (  # noqa: E402
    VPredictor as RefVPredictor,
)
from torchmultimodal.diffusion_labs.schedules import (  # noqa: E402
    discrete_gaussian_schedule as ref_sched,
)

STEPS = 50


def _pair_schedules(variance_range=0.0):
    betas_ref = ref_sched.linear_beta_schedule(STEPS)
    ours = DiscreteGaussianSchedule(
        jnp.asarray(betas_ref.numpy(), jnp.float32), variance_range
    )
    ref = ref_sched.DiscreteGaussianSchedule(betas_ref, variance_range)
    return ours, ref


@pytest.mark.parametrize(
    "ours_fn,ref_fn",
    [
        (cosine_beta_schedule, ref_sched.cosine_beta_schedule),
        (linear_beta_schedule, ref_sched.linear_beta_schedule),
        (quadratic_beta_schedule, ref_sched.quadratic_beta_schedule),
        (sigmoid_beta_schedule, ref_sched.sigmoid_beta_schedule),
    ],
)
def test_beta_schedule_parity(ours_fn, ref_fn):
    ours = np.asarray(ours_fn(STEPS))
    ref = ref_fn(STEPS).to(torch.float32).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


QUANTITIES = [
    "alphas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "sqrt_alphas_cumprod",
    "sqrt_compliment_alphas_cumprod",
    "sqrt_recip_alphas_cumprod",
    "sqrt_recip_alphas_cumprod_minus_one",
    "lower_posterior_log_variance",
    "upper_posterior_log_variance",
    "posterior_mean_x0_coef",
    "posterior_mean_xt_coef",
]


@pytest.mark.parametrize("name", QUANTITIES)
def test_schedule_quantity_parity(name):
    ours, ref = _pair_schedules()
    t = np.array([0, 1, STEPS // 2, STEPS - 1])
    shape = (len(t), 3, 4, 4)
    got = np.asarray(ours(name, jnp.asarray(t), shape))
    want = ref(name, torch.as_tensor(t), shape).to(torch.float32).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_q_sample_q_posterior_parity():
    ours, ref = _pair_schedules(variance_range=0.3)
    rng = np.random.RandomState(0)
    x0 = rng.randn(4, 3, 8, 8).astype(np.float32)
    noise = rng.randn(4, 3, 8, 8).astype(np.float32)
    t = np.array([0, 7, 21, STEPS - 1])

    got_xt = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t)))
    want_xt = ref.q_sample(
        torch.as_tensor(x0), torch.as_tensor(noise), torch.as_tensor(t)
    ).numpy()
    np.testing.assert_allclose(got_xt, want_xt, rtol=2e-5, atol=1e-6)

    got_mean, got_logvar = ours.q_posterior(
        jnp.asarray(x0), jnp.asarray(got_xt), jnp.asarray(t)
    )
    want_mean, want_logvar = ref.q_posterior(
        torch.as_tensor(x0), torch.as_tensor(want_xt), torch.as_tensor(t)
    )
    np.testing.assert_allclose(np.asarray(got_mean), want_mean.numpy(), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_logvar), want_logvar.numpy(), rtol=2e-5, atol=1e-6
    )


@pytest.mark.parametrize(
    "ours_cls,ref_cls",
    [
        (NoisePredictor, RefNoisePredictor),
        (TargetPredictor, RefTargetPredictor),
        (VPredictor, RefVPredictor),
    ],
)
def test_predictor_parity(ours_cls, ref_cls):
    ours_s, ref_s = _pair_schedules()
    ours_p = ours_cls(ours_s)
    ref_p = ref_cls(ref_s, None)
    rng = np.random.RandomState(1)
    pred = rng.randn(4, 3, 8, 8).astype(np.float32)
    xt = rng.randn(4, 3, 8, 8).astype(np.float32)
    t = np.array([0, 5, 30, STEPS - 1])

    got_x0 = np.asarray(ours_p.predict_x0(jnp.asarray(pred), jnp.asarray(xt), jnp.asarray(t)))
    want_x0 = ref_p.predict_x0(
        torch.as_tensor(pred), torch.as_tensor(xt), torch.as_tensor(t)
    ).numpy()
    np.testing.assert_allclose(got_x0, want_x0, rtol=2e-4, atol=1e-4)

    got_noise = np.asarray(
        ours_p.predict_noise(jnp.asarray(pred), jnp.asarray(xt), jnp.asarray(t))
    )
    want_noise = ref_p.predict_noise(
        torch.as_tensor(pred), torch.as_tensor(xt), torch.as_tensor(t)
    ).numpy()
    np.testing.assert_allclose(got_noise, want_noise, rtol=2e-4, atol=1e-4)


def test_v_target_matches_reference_formula():
    # reference computes v inline in RandomDiffusionSteps users; the closed
    # form is v = sqrt(alphas_cumprod) * noise - sqrt(1 - alphas_cumprod) * x0
    ours_s, ref_s = _pair_schedules()
    rng = np.random.RandomState(2)
    x0 = rng.randn(2, 3, 4, 4).astype(np.float32)
    noise = rng.randn(2, 3, 4, 4).astype(np.float32)
    t = np.array([3, 40])
    got = np.asarray(v_target(ours_s, jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t)))
    shape = x0.shape
    a = ref_s("sqrt_alphas_cumprod", torch.as_tensor(t), shape)
    b = ref_s("sqrt_compliment_alphas_cumprod", torch.as_tensor(t), shape)
    want = (a * torch.as_tensor(noise) - b * torch.as_tensor(x0)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_vlb_loss_parity():
    ours_s, ref_s = _pair_schedules()
    ours_l, ref_l = VLBLoss(ours_s), RefVLBLoss(ref_s)
    rng = np.random.RandomState(3)
    x0 = np.clip(rng.randn(6, 3, 8, 8), -1, 1).astype(np.float32)
    xt = rng.randn(6, 3, 8, 8).astype(np.float32)
    pred_mean = rng.randn(6, 3, 8, 8).astype(np.float32)
    pred_logvar = rng.randn(6, 3, 8, 8).astype(np.float32) * 0.1
    # include t == 0 to exercise the decoder-NLL branch
    t = np.array([0, 0, 1, 10, 25, STEPS - 1])

    got = float(
        ours_l(
            jnp.asarray(pred_mean),
            jnp.asarray(pred_logvar),
            jnp.asarray(x0),
            jnp.asarray(xt),
            jnp.asarray(t),
        )
    )
    want = float(
        ref_l(
            torch.as_tensor(pred_mean),
            torch.as_tensor(pred_logvar),
            torch.as_tensor(x0),
            torch.as_tensor(xt),
            torch.as_tensor(t),
        )
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_hybrid_loss_parity():
    ours_s, ref_s = _pair_schedules()
    ours_l, ref_l = DiffusionHybridLoss(ours_s), RefHybridLoss(ref_s)
    rng = np.random.RandomState(4)
    x0 = np.clip(rng.randn(4, 3, 8, 8), -1, 1).astype(np.float32)
    xt = rng.randn(4, 3, 8, 8).astype(np.float32)
    pred = rng.randn(4, 3, 8, 8).astype(np.float32)
    target = rng.randn(4, 3, 8, 8).astype(np.float32)
    mean = rng.randn(4, 3, 8, 8).astype(np.float32)
    logvar = rng.randn(4, 3, 8, 8).astype(np.float32) * 0.1
    t = np.array([0, 2, 17, STEPS - 1])

    got = float(
        ours_l(
            jnp.asarray(pred),
            jnp.asarray(target),
            jnp.asarray(mean),
            jnp.asarray(logvar),
            jnp.asarray(x0),
            jnp.asarray(xt),
            jnp.asarray(t),
        )
    )
    want = float(
        ref_l(
            torch.as_tensor(pred),
            torch.as_tensor(target),
            torch.as_tensor(mean),
            torch.as_tensor(logvar),
            torch.as_tensor(x0),
            torch.as_tensor(xt),
            torch.as_tensor(t),
        )
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_respaced_eval_schedule_parity():
    """Our _respaced betas must equal the reference DDPModule's eval_schedule
    construction (Improved DDPM eq. 19, samplers/ddpm.py:85-92)."""
    ours_s, ref_s = _pair_schedules()
    eval_steps = np.array([0, 9, 19, 29, 39, 49])
    got = np.asarray(_respaced(ours_s, eval_steps).betas)

    alphas_cumprod = ref_s.alphas_cumprod[torch.as_tensor(eval_steps)]
    alphas_cumprod_prev = torch.nn.functional.pad(
        alphas_cumprod[:-1], (1, 0), value=1.0
    )
    want = (1 - alphas_cumprod / alphas_cumprod_prev).to(torch.float32).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
