"""End-to-end DDIM sampling-loop parity vs the reference (samplers/ddim.py):
with eta=0 the reverse process is deterministic, so a shared mock model lets
us compare the FULL multi-step loop — respaced eval steps, predictor
round-trips, Song et al. eq. 12 — bit-for-bit between the torch generator
loop and our single `lax.scan`."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from multimodal_tpu.diffusion_labs.predictors.predictors import NoisePredictor  # noqa: E402
from multimodal_tpu.diffusion_labs.samplers.ddim import DDIModule  # noqa: E402
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (  # noqa: E402
    DiscreteGaussianSchedule,
)
from multimodal_tpu.diffusion_labs.utils import DiffusionOutput  # noqa: E402

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.diffusion_labs.predictors.noise_predictor import (  # noqa: E402
    NoisePredictor as RefNoisePredictor,
)
from torchmultimodal.diffusion_labs.samplers.ddim import (  # noqa: E402
    DDIModule as RefDDIModule,
)
from torchmultimodal.diffusion_labs.schedules.discrete_gaussian_schedule import (  # noqa: E402
    DiscreteGaussianSchedule as RefSchedule,
    linear_beta_schedule as ref_linear_beta_schedule,
)
from torchmultimodal.diffusion_labs.utils.common import (  # noqa: E402
    DiffusionOutput as RefDiffusionOutput,
)

STEPS = 40


class _RefMock(torch.nn.Module):
    """Deterministic stand-in denoiser: pred = 0.1*x + sin(t/STEPS)."""

    def forward(self, x, t, c):
        tt = (t.float() / STEPS).reshape(-1, *([1] * (x.dim() - 1)))
        return RefDiffusionOutput(prediction=0.1 * x + torch.sin(tt))


class _OurMock(nn.Module):
    @nn.compact
    def __call__(self, x, t, c):
        tt = (t.astype(jnp.float32) / STEPS).reshape(-1, *([1] * (x.ndim - 1)))
        return DiffusionOutput(prediction=0.1 * x + jnp.sin(tt))


@pytest.mark.parametrize(
    "eval_every", [pytest.param(1, marks=pytest.mark.slow), 5]
)
def test_ddim_full_loop_parity(eval_every):
    betas_ref = ref_linear_beta_schedule(STEPS)
    ref_schedule = RefSchedule(betas_ref)
    our_schedule = DiscreteGaussianSchedule(jnp.asarray(betas_ref.numpy()))

    eval_steps = np.arange(0, STEPS, eval_every)
    ref_sampler = RefDDIModule(
        model=_RefMock(),
        schedule=ref_schedule,
        predictor=RefNoisePredictor(ref_schedule, None),
        eval_steps=torch.as_tensor(eval_steps),
        progress_bar=False,
        eta=0.0,
    ).eval()

    our_sampler = DDIModule(
        model=_OurMock(),
        schedule=our_schedule,
        predictor=NoisePredictor(our_schedule),
        eval_steps=eval_steps,
        eta=0.0,
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
        our_sampler.apply(
            variables, jnp.asarray(xt), rng=jax.random.PRNGKey(2)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
