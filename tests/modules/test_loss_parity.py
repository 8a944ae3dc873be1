"""Small-loss parity vs the PyTorch reference: reconstruction, commitment,
contrastive-with-temperature."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
    contrastive_loss_with_temperature,
)
from multimodal_tpu.modules.losses.reconstruction_loss import reconstruction_loss
from multimodal_tpu.modules.losses.vqvae import commitment_loss

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.modules.losses.contrastive_loss_with_temperature import (  # noqa: E402
    ContrastiveLossWithTemperature,
)
from torchmultimodal.modules.losses.reconstruction_loss import (  # noqa: E402
    ReconstructionLoss,
)
from torchmultimodal.modules.losses.vqvae import CommitmentLoss  # noqa: E402


@pytest.mark.parametrize("normalize_target", [True, False])
def test_reconstruction_loss_parity(normalize_target):
    r = np.random.RandomState(0)
    pred = r.randn(2, 9, 12).astype(np.float32)
    target = r.randn(2, 9, 12).astype(np.float32)
    mask = (r.rand(2, 9) > 0.4).astype(np.float32)
    with torch.no_grad():
        want = float(ReconstructionLoss(normalize_target)(
            torch.as_tensor(pred), torch.as_tensor(target), torch.as_tensor(mask)))
    got = float(reconstruction_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
        normalize_target=normalize_target))
    assert got == pytest.approx(want, rel=1e-4)


def test_commitment_loss_parity():
    r = np.random.RandomState(1)
    quantized = r.randn(2, 5, 4).astype(np.float32)
    encoded = r.randn(2, 5, 4).astype(np.float32)
    with torch.no_grad():
        want = float(CommitmentLoss(commitment_cost=0.25)(
            torch.as_tensor(quantized), torch.as_tensor(encoded)))
    got = float(commitment_loss(
        jnp.asarray(quantized), jnp.asarray(encoded), commitment_cost=0.25))
    assert got == pytest.approx(want, rel=1e-5)


def test_contrastive_loss_parity_random_inputs():
    r = np.random.RandomState(2)
    a = r.randn(6, 8).astype(np.float32)
    b = r.randn(6, 8).astype(np.float32)
    ref = ContrastiveLossWithTemperature(logit_scale=2.0)
    with torch.no_grad():
        want = float(ref(torch.as_tensor(a), torch.as_tensor(b)))
    got = float(contrastive_loss_with_temperature(
        jnp.asarray(a), jnp.asarray(b), logit_scale=jnp.asarray(2.0)).loss)
    assert got == pytest.approx(want, rel=1e-5)


def test_sinusoidal_time_embedding_parity():
    from multimodal_tpu.modules.layers.position_embedding import (
        SinusoidalPositionEmbeddings,
    )
    from torchmultimodal.modules.layers.position_embedding import (
        SinusoidalPositionEmbeddings as TorchSinusoidal,
    )

    emb_dim = 16
    t = np.array([0, 1, 5, 999])
    ref = TorchSinusoidal(emb_dim)
    with torch.no_grad():
        want = ref(torch.as_tensor(t)).numpy()
    mod = SinusoidalPositionEmbeddings(emb_dim)
    got = np.asarray(mod(jnp.asarray(t)) if not hasattr(mod, "init")
                     else mod.apply(mod.init(jax.random.PRNGKey(0), jnp.asarray(t)),
                                    jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
