"""Collectives with explicit gradient semantics.

TPU-native replacement for the reference's NCCL-backed gather utilities
(``torchmultimodal/utils/distributed.py``: BackpropType:16, gather_tensor:28,
concat_gather_all_gpu:61, get_rank:86).

These functions are meant to run inside ``shard_map`` (or any context with a
named mesh axis). Mapping of gradient semantics:

  - ``GLOBAL``: ``jax.lax.all_gather`` — already differentiable in JAX; its
    VJP is a reduce-scatter, exactly the semantics of
    ``torch.distributed.nn.functional.all_gather``.
  - ``LOCAL``: gather without gradient, then splice the live local shard back
    in at this device's offset — gradients flow only through the local
    slice (reference ``distributed.py:51-58``).
  - ``NONE``: fully detached gather.

Outside any mesh axis (``axis_name=None``), these are identity — matching
the reference's not-initialized fallback.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp


class BackpropType(enum.Enum):
    GLOBAL = 0
    LOCAL = 1
    NONE = 2


def get_axis_index(axis_name: Optional[str]) -> jnp.ndarray:
    """This device's index along the mesh axis (0 when unmapped)."""
    if axis_name is None:
        return jnp.array(0, dtype=jnp.int32)
    return jax.lax.axis_index(axis_name)


def all_gather_with_backprop_type(
    x: jnp.ndarray,
    axis_name: Optional[str],
    backprop_type: BackpropType = BackpropType.GLOBAL,
) -> jnp.ndarray:
    """All-gather ``x`` along ``axis_name``, concatenated on dim 0.

    Returns ``x`` unchanged when ``axis_name`` is None.
    """
    if axis_name is None:
        return x
    if backprop_type == BackpropType.GLOBAL:
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    gathered = jax.lax.stop_gradient(
        jax.lax.all_gather(jax.lax.stop_gradient(x), axis_name, axis=0, tiled=True)
    )
    if backprop_type == BackpropType.LOCAL:
        idx = jax.lax.axis_index(axis_name)
        start = (idx * x.shape[0],) + (0,) * (x.ndim - 1)
        gathered = jax.lax.dynamic_update_slice(gathered, x, start)
    return gathered


# Name parity with the reference's concat_gather_all_gpu.
concat_gather = all_gather_with_backprop_type
