"""Converted-weight parity for the LDM variational autoencoder vs the
reference (diffusion_labs/models/vae/vae.py:76 ldm_variational_autoencoder):
encoder moments through quant_conv, decoder output through post_quant_conv,
and the deterministic (posterior-mean) full forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.diffusion_labs.models.vae import (  # noqa: E402
    ldm_variational_autoencoder,
)
from multimodal_tpu.utils.checkpoint import vae_params_from_torch  # noqa: E402

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.diffusion_labs.models.vae.vae import (  # noqa: E402
    ldm_variational_autoencoder as ref_ldm_vae,
)

CHANNELS = 32
MULTIPLIERS = (1, 2)
NUM_RES = 1
Z_CHANNELS = 4
EMBED_CHANNELS = 4


@pytest.fixture(scope="module")
def vae_pair():
    torch.manual_seed(0)
    ref = ref_ldm_vae(
        embedding_channels=EMBED_CHANNELS,
        in_channels=3,
        out_channels=3,
        z_channels=Z_CHANNELS,
        channels=CHANNELS,
        num_res_blocks=NUM_RES,
        channel_multipliers=MULTIPLIERS,
        norm_groups=32,
    )
    ref.eval()
    ours = ldm_variational_autoencoder(
        embedding_channels=EMBED_CHANNELS,
        out_channels=3,
        z_channels=Z_CHANNELS,
        channels=CHANNELS,
        num_res_blocks=NUM_RES,
        channel_multipliers=MULTIPLIERS,
    )
    params = vae_params_from_torch(ref, NUM_RES, MULTIPLIERS)
    return ref, ours, params


def test_vae_encode_parity(vae_pair):
    ref, ours, params = vae_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)

    with torch.no_grad():
        want = ref.encode(torch.as_tensor(x))
    want_mean = want.mean.numpy()
    want_std = want.stddev.numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = jax.jit(lambda p, x: ours.apply(p, x, method=ours.encode))(params, x_nhwc)
    got_mean = np.asarray(got.mean).transpose(0, 3, 1, 2)
    got_std = np.exp(0.5 * np.clip(np.asarray(got.logvar), -30, 20)).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(got_std, want_std, rtol=1e-3, atol=2e-4)


def test_vae_decode_parity(vae_pair):
    ref, ours, params = vae_pair
    rng = np.random.RandomState(1)
    z = rng.randn(2, EMBED_CHANNELS, 8, 8).astype(np.float32)

    with torch.no_grad():
        want = ref.decode(torch.as_tensor(z)).numpy()

    z_nhwc = jnp.asarray(z.transpose(0, 2, 3, 1))
    got = jax.jit(lambda p, z: ours.apply(p, z, method=ours.decode))(params, z_nhwc)
    got = np.asarray(got).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_vae_deterministic_forward_parity(vae_pair):
    ref, ours, params = vae_pair
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 16, 16).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.as_tensor(x), sample_posterior=False).decoder_output.numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got, _ = jax.jit(lambda p, x: ours.apply(p, x, sample_posterior=False))(params, x_nhwc)
    got = np.asarray(got).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)
