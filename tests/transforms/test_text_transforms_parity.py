"""Text-primitive parity vs the reference (transforms/text_transforms.py:
Truncate:14, AddToken:35, PadTransform:58, ToTensor:86)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_tpu.transforms.text_transforms import (  # noqa: E402
    AddToken,
    PadTransform,
    ToTensor,
    Truncate,
)

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.transforms import text_transforms as ref_tt  # noqa: E402

BATCH = [[5, 6, 7, 8, 9, 10], [1, 2], [3]]


def test_truncate_parity():
    got = Truncate(4)(BATCH)
    want = ref_tt.Truncate(4)(BATCH)
    assert got == want


def test_add_token_parity():
    for begin in (True, False):
        got = AddToken(99, begin=begin)(BATCH)
        want = ref_tt.AddToken(99, begin=begin)(BATCH)
        assert got == want


def test_to_tensor_pad_parity():
    got = ToTensor(padding_value=0)(BATCH)
    want = ref_tt.ToTensor(padding_value=0)(BATCH).numpy()
    np.testing.assert_array_equal(got, want)


def test_pad_transform_parity():
    x = torch.as_tensor([[1, 2, 3], [4, 5, 6]])
    want = ref_tt.PadTransform(max_length=7, pad_value=0)(x).numpy()
    got = PadTransform(max_length=7, pad_value=0)(np.asarray([[1, 2, 3], [4, 5, 6]]))
    np.testing.assert_array_equal(np.asarray(got), want)
