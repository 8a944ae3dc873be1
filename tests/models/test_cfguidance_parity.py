"""CFGuidance adapter parity vs the reference
(diffusion_labs/modules/adapters/cfguidance.py): eval-mode guided mixing
``(1+g)·cond − g·uncond`` through the doubled-batch forward, the guidance=0
path, and the missing-condition (null-embedding broadcast) path — with the
reference's learned null embeddings copied into our params."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from multimodal_tpu.diffusion_labs.adapters.cfguidance import CFGuidance  # noqa: E402
from multimodal_tpu.diffusion_labs.utils import DiffusionOutput  # noqa: E402

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.diffusion_labs.modules.adapters.cfguidance import (  # noqa: E402
    CFGuidance as RefCFGuidance,
)
from torchmultimodal.diffusion_labs.utils.common import (  # noqa: E402
    DiffusionOutput as RefDiffusionOutput,
)

DIM = 6


class _RefMock(torch.nn.Module):
    def forward(self, x, t, c):
        cond = c["clip"].float().mean(dim=-1).reshape(-1, *([1] * (x.dim() - 1)))
        tt = t.float().reshape(-1, *([1] * (x.dim() - 1)))
        return RefDiffusionOutput(
            prediction=0.1 * x + cond + 0.01 * tt,
            variance_value=0.2 * x,
        )


class _OurMock(nn.Module):
    @nn.compact
    def __call__(self, x, t, c):
        cond = c["clip"].astype(jnp.float32).mean(axis=-1).reshape(-1, *([1] * (x.ndim - 1)))
        tt = t.astype(jnp.float32).reshape(-1, *([1] * (x.ndim - 1)))
        return DiffusionOutput(prediction=0.1 * x + cond + 0.01 * tt,
                               variance_value=0.2 * x)


def _build(guidance):
    torch.manual_seed(0)
    ref = RefCFGuidance(
        model=_RefMock(), dim_cond={"clip": DIM}, p=0.1,
        guidance=guidance, learn_null_emb=True,
    ).eval()
    ours = CFGuidance(
        model=_OurMock(), dim_cond={"clip": DIM}, p=0.1,
        guidance=guidance, learn_null_emb=True,
    )
    # copy the reference's learned null embedding into our params (the
    # reference keeps separate train/eval copies; eval mode reads the eval
    # one, which defaults to the learned train embedding)
    sd = ref.state_dict()
    null = sd["eval_unconditional_embedding.clip"].numpy().reshape(1, DIM)
    variables = {"params": {"uncond_clip": jnp.asarray(null)}}
    return ref, ours, variables


@pytest.mark.parametrize("guidance", [0.0, 3.0])
def test_cfguidance_eval_with_condition(guidance):
    ref, ours, variables = _build(guidance)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    t = np.array([3, 7])
    clip = rng.randn(2, DIM).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.as_tensor(x), torch.as_tensor(t),
                   {"clip": torch.as_tensor(clip)})

    got = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(t),
        {"clip": jnp.asarray(clip)},
    )
    np.testing.assert_allclose(
        np.asarray(got.prediction), want.prediction.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.variance_value), want.variance_value.numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_cfguidance_eval_missing_condition_uses_null():
    ref, ours, variables = _build(guidance=2.0)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    t = np.array([1, 5])

    with torch.no_grad():
        want = ref(torch.as_tensor(x), torch.as_tensor(t), None)

    got = ours.apply(variables, jnp.asarray(x), jnp.asarray(t), None)
    np.testing.assert_allclose(
        np.asarray(got.prediction), want.prediction.numpy(), rtol=1e-5, atol=1e-6
    )


def test_cfguidance_eval_embedding_override():
    """`eval_unconditional_embeddings` replaces the learned null embedding
    at eval (reference cfguidance.py:96-98)."""
    torch.manual_seed(0)
    override = np.full((1, DIM), 0.5, np.float32)
    ref = RefCFGuidance(
        model=_RefMock(), dim_cond={"clip": DIM}, p=0.1, guidance=2.0,
        learn_null_emb=True,
        eval_unconditional_embeddings={"clip": torch.as_tensor(override)},
    ).eval()
    ours = CFGuidance(
        model=_OurMock(), dim_cond={"clip": DIM}, p=0.1, guidance=2.0,
        learn_null_emb=True,
        eval_unconditional_embeddings={"clip": override},
    )
    sd = ref.state_dict()
    variables = {"params": {"uncond_clip": jnp.asarray(
        sd["train_unconditional_embedding.clip"].numpy().reshape(1, DIM))}}

    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    t = np.array([2, 9])
    clip = rng.randn(2, DIM).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.as_tensor(x), torch.as_tensor(t),
                   {"clip": torch.as_tensor(clip)})
    got = ours.apply(variables, jnp.asarray(x), jnp.asarray(t),
                     {"clip": jnp.asarray(clip)})
    np.testing.assert_allclose(
        np.asarray(got.prediction), want.prediction.numpy(), rtol=1e-5, atol=1e-6
    )
