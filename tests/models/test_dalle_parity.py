"""DALL-E dVAE encoder parity (FLAVA's frozen MIM codebook)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.flava.dalle_vae import DalleEncoder
from multimodal_tpu.utils.checkpoint import dalle_encoder_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.flava.model import DalleEncoder as TorchDalleEncoder  # noqa: E402

CFG = dict(group_count=1, n_blk_per_group=2, n_hid=8, vocab_size=16)


def test_dalle_encoder_parity_tiny():
    torch.manual_seed(0)
    ref = TorchDalleEncoder(**CFG).eval()
    params = dalle_encoder_params_from_torch(ref.state_dict(), n_blk_per_group=2)
    model = DalleEncoder(**CFG)

    img = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        want = ref(img).numpy()  # (b, vocab, h/8, w/8)
    got = np.asarray(model.apply(params, jnp.asarray(img.permute(0, 2, 3, 1).numpy())))
    want_nhwc = want.transpose(0, 2, 3, 1)
    assert got.shape == want_nhwc.shape
    np.testing.assert_allclose(got, want_nhwc, atol=5e-4, rtol=1e-3)
    # codebook indices (the MIM labels) must agree exactly
    assert (got.argmax(-1) == want_nhwc.argmax(-1)).all()


def test_load_dalle_encoder_params_local_path(tmp_path):
    """The encoder.pkl loading analog (reference models/flava/model.py:726):
    a local checkpoint loads through the pretrained layer and produces the
    same params as the direct converter, whether saved as a raw state dict
    or as a pickled module exposing .state_dict()."""
    import jax

    from multimodal_tpu.utils.pretrained import load_dalle_encoder_params

    torch.manual_seed(0)
    ref = TorchDalleEncoder(**CFG).eval()

    p1 = dalle_encoder_params_from_torch(ref.state_dict())

    sd_path = tmp_path / "encoder_sd.pt"
    torch.save(ref.state_dict(), str(sd_path))
    p2 = load_dalle_encoder_params(str(sd_path), group_count=1, n_blk_per_group=2)

    pkl_path = tmp_path / "encoder.pkl"
    torch.save(ref, str(pkl_path))
    p3 = load_dalle_encoder_params(str(pkl_path), group_count=1, n_blk_per_group=2)

    for other in (p2, p3):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            p1, other,
        )
