"""End-to-end DDPM sampling-loop parity vs the reference (samplers/ddpm.py):
with the schedule's noise source zeroed on both sides, the reverse process
is the deterministic posterior-mean iteration — comparing the FULL loop
checks the respaced eval schedule, eval_steps_map timestep remapping,
learned-variance interpolation, and the t==0 noise mask."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from multimodal_tpu.diffusion_labs.predictors.predictors import NoisePredictor  # noqa: E402
from multimodal_tpu.diffusion_labs.samplers.ddpm import DDPModule  # noqa: E402
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (  # noqa: E402
    DiscreteGaussianSchedule,
)
from multimodal_tpu.diffusion_labs.utils import DiffusionOutput  # noqa: E402

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.diffusion_labs.predictors.noise_predictor import (  # noqa: E402
    NoisePredictor as RefNoisePredictor,
)
from torchmultimodal.diffusion_labs.samplers.ddpm import (  # noqa: E402
    DDPModule as RefDDPModule,
)
from torchmultimodal.diffusion_labs.schedules.discrete_gaussian_schedule import (  # noqa: E402
    DiscreteGaussianSchedule as RefSchedule,
    linear_beta_schedule as ref_linear_beta_schedule,
)
from torchmultimodal.diffusion_labs.utils.common import (  # noqa: E402
    DiffusionOutput as RefDiffusionOutput,
)

STEPS = 40


class _RefZeroNoiseSchedule(RefSchedule):
    def sample_noise(self, x_like):
        return torch.zeros_like(x_like)


class _OurZeroNoiseSchedule(DiscreteGaussianSchedule):
    def sample_noise(self, rng, x_like):
        return jnp.zeros_like(x_like)


class _RefMock(torch.nn.Module):
    def forward(self, x, t, c):
        tt = (t.float() / STEPS).reshape(-1, *([1] * (x.dim() - 1)))
        return RefDiffusionOutput(
            prediction=0.1 * x + torch.sin(tt),
            variance_value=torch.full_like(x, 0.3),
        )


class _OurMock(nn.Module):
    @nn.compact
    def __call__(self, x, t, c):
        tt = (t.astype(jnp.float32) / STEPS).reshape(-1, *([1] * (x.ndim - 1)))
        return DiffusionOutput(
            prediction=0.1 * x + jnp.sin(tt),
            variance_value=jnp.full_like(x, 0.3),
        )


@pytest.mark.parametrize("eval_every", [4])
def test_ddpm_full_loop_parity_respaced(eval_every):
    betas_ref = ref_linear_beta_schedule(STEPS)
    ref_schedule = _RefZeroNoiseSchedule(betas_ref)
    our_schedule = _OurZeroNoiseSchedule(jnp.asarray(betas_ref.numpy()))

    eval_steps = np.arange(0, STEPS, eval_every)
    ref_sampler = RefDDPModule(
        model=_RefMock(),
        schedule=ref_schedule,
        predictor=RefNoisePredictor(ref_schedule, None),
        eval_steps=torch.as_tensor(eval_steps),
        progress_bar=False,
    ).eval()

    our_sampler = DDPModule(
        model=_OurMock(),
        schedule=our_schedule,
        predictor=NoisePredictor(our_schedule),
        eval_steps=eval_steps,
    )

    rng = np.random.RandomState(0)
    xt = rng.randn(2, 3, 8, 8).astype(np.float32)

    with torch.no_grad():
        want = ref_sampler(torch.as_tensor(xt)).numpy()

    variables = our_sampler.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jnp.asarray(xt),
    )
    got = np.asarray(
        our_sampler.apply(variables, jnp.asarray(xt), rng=jax.random.PRNGKey(2))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
