"""Parity for L0 utility functions vs the reference
(utils/attention.py:13,56; utils/common.py:26,69,110)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.utils.attention import (  # noqa: E402
    get_causal_attention_mask,
    get_extended_attention_mask,
)
from multimodal_tpu.utils.common import (  # noqa: E402
    momentum_update,
    shift_dim,
    tensor_slice,
)

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.utils.attention import (  # noqa: E402
    get_causal_attention_mask as ref_causal,
    get_extended_attention_mask as ref_extended,
)
from torchmultimodal.utils.common import (  # noqa: E402
    shift_dim as ref_shift_dim,
    tensor_slice as ref_tensor_slice,
)


@pytest.mark.parametrize("shape", [(2, 5), (2, 4, 6), (2, 3, 4, 6)])
def test_extended_attention_mask_parity(shape):
    """Ours returns the additive-bias form (0 attend / large-negative
    ignore); the reference returns the broadcast 0/1 mask — compare the
    encoded semantics position by position at identical broadcast shape."""
    mask = np.random.RandomState(0).randint(0, 2, shape).astype(np.float32)
    got = np.asarray(get_extended_attention_mask(jnp.asarray(mask)))
    want = ref_extended(torch.as_tensor(mask)).numpy()
    assert got.shape == want.shape
    np.testing.assert_array_equal(got >= -0.5, want > 0.5)
    assert (got[want > 0.5] == 0).all()
    assert (got[want < 0.5] <= -1e8).all()


@pytest.mark.parametrize("tgt,src", [(5, None), (3, 7), (7, 3)])
def test_causal_attention_mask_parity(tgt, src):
    got = np.asarray(get_causal_attention_mask(tgt, src))
    want = ref_causal(tgt, src).numpy()
    np.testing.assert_array_equal(got.astype(np.float32), want)


@pytest.mark.parametrize("src,dest", [(0, -1), (-1, 0), (1, 2), (2, 1)])
def test_shift_dim_parity(src, dest):
    x = np.random.RandomState(1).rand(2, 3, 4, 5).astype(np.float32)
    got = np.asarray(shift_dim(jnp.asarray(x), src, dest))
    want = ref_shift_dim(torch.as_tensor(x), src, dest).numpy()
    np.testing.assert_array_equal(got, want)


def test_tensor_slice_parity():
    x = np.random.RandomState(2).rand(4, 6, 8).astype(np.float32)
    # reference semantics: size -1 means "to the end"
    got = np.asarray(tensor_slice(jnp.asarray(x), [1, 2, 0], [2, -1, 4]))
    want = ref_tensor_slice(torch.as_tensor(x), [1, 2, 0], [2, -1, 4]).numpy()
    np.testing.assert_array_equal(got, want)


def test_momentum_update_matches_reference_formula():
    """Reference momentum_update (utils/common.py:110) mutates in place:
    m = m * momentum + p * (1 - momentum)."""
    rng = np.random.RandomState(3)
    p = {"w": rng.rand(3, 3).astype(np.float32)}
    m = {"w": rng.rand(3, 3).astype(np.float32)}
    momentum = 0.995
    got = momentum_update(
        {"w": jnp.asarray(p["w"])}, {"w": jnp.asarray(m["w"])}, momentum
    )
    want = m["w"] * momentum + p["w"] * (1 - momentum)
    np.testing.assert_allclose(np.asarray(got["w"]), want, rtol=1e-6)
