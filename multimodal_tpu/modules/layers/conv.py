"""TF-style "SAME" padded 3-D convolutions.

Parity with reference ``modules/layers/conv.py`` (SamePadConv3d:15,
SamePadConvTranspose3d:75, calculate_same_padding:133,
calculate_transpose_padding:182). TPU-native: layout is channel-last
``(b, t, h, w, c)`` (NDHWC) so XLA maps convs straight onto the MXU; SAME
padding for strided convs is computed per-dim exactly as the reference does
(asymmetric pad, extra on the trailing side).
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.utils.common import to_tuple_tuple


def _to_tuple(v: Union[int, Tuple[int, ...]], n: int) -> Tuple[int, ...]:
    return (v,) * n if isinstance(v, int) else tuple(v)


def calculate_same_padding(
    kernel_size: Union[int, Tuple[int, ...]],
    stride: Union[int, Tuple[int, ...]],
    input_shape: Tuple[int, ...],
) -> Tuple[Tuple[int, int], ...]:
    """Per-dim (before, after) padding replicating TF SAME semantics.

    ``input_shape`` are the spatial dims only. Mirrors reference
    ``conv.py:133`` (which computes total pad = max(k - (d % s or s), 0) per
    dim, splitting with the extra cell on the trailing edge).
    """
    n = len(input_shape)
    kernel_size = _to_tuple(kernel_size, n)
    stride = _to_tuple(stride, n)
    pads = []
    for d, k, s in zip(input_shape, kernel_size, stride):
        if d % s == 0:
            total = max(k - s, 0)
        else:
            total = max(k - d % s, 0)
        pads.append((total // 2, total - total // 2))
    return tuple(pads)


def calculate_transpose_padding(
    kernel_size: Union[int, Tuple[int, ...]],
    stride: Union[int, Tuple[int, ...]],
    input_shape: Tuple[int, ...],
    input_pad: Tuple[Tuple[int, int], ...],
) -> Tuple[Tuple[int, int], ...]:
    """Crop amounts for transpose conv so output = input * stride (SAME)."""
    n = len(input_shape)
    kernel_size = _to_tuple(kernel_size, n)
    stride = _to_tuple(stride, n)
    crops = []
    for d, k, s, (pb, pa) in zip(input_shape, kernel_size, stride, input_pad):
        # Output of unpadded transpose conv: (d + pb + pa - 1) * s + k.
        # Desired output: (d + pb + pa) * s, cropped back by padded region * s.
        out_full = (d + pb + pa - 1) * s + k
        desired = d * s
        total_crop = out_full - desired
        crop_before = pb * s + (k - s) // 2 if total_crop > 0 else 0
        crop_after = total_crop - crop_before
        crops.append((crop_before, crop_after))
    return tuple(crops)


class SamePadConv3d(nn.Module):
    """Conv3d with SAME padding for arbitrary per-dim strides. NDHWC layout."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]]
    stride: Union[int, Tuple[int, int, int]] = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial = x.shape[1:-1]
        pads = calculate_same_padding(self.kernel_size, self.stride, spatial)
        x = jnp.pad(x, ((0, 0),) + pads + ((0, 0),))
        return nn.Conv(
            self.out_channels,
            kernel_size=_to_tuple(self.kernel_size, 3),
            strides=_to_tuple(self.stride, 3),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class SamePadConvTranspose3d(nn.Module):
    """ConvTranspose3d with SAME semantics: output spatial = input * stride."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]]
    stride: Union[int, Tuple[int, int, int]] = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = _to_tuple(self.kernel_size, 3)
        stride = _to_tuple(self.stride, 3)
        y = nn.ConvTranspose(
            self.out_channels,
            kernel_size=kernel,
            strides=stride,
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="convt",
        )(x)
        # Crop symmetric-ish to input*stride (SAME transpose semantics).
        target = tuple(d * s for d, s in zip(x.shape[1:-1], stride))
        slices = [slice(None)]
        for out_d, tgt in zip(y.shape[1:-1], target):
            excess = out_d - tgt
            lo = excess // 2
            slices.append(slice(lo, lo + tgt))
        slices.append(slice(None))
        return y[tuple(slices)]


__all__ = [
    "SamePadConv3d",
    "SamePadConvTranspose3d",
    "calculate_same_padding",
    "calculate_transpose_padding",
    "to_tuple_tuple",
]
