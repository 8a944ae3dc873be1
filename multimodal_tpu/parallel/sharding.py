"""Parameter/batch sharding rules (DDP / FSDP / TP analogs).

TPU-native replacement for the reference's DDP/FSDP wrapping
(``examples/flava/native/train.py:167-211``): instead of a runtime that
shards modules, we annotate a param pytree with ``NamedSharding``s and let
GSPMD insert all-gathers/reduce-scatters. ``fsdp_sharding`` is the ZeRO-3
analog of the reference's ``transformer_auto_wrap_policy`` + FSDP.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_sharding(
    params: Any,
    mesh: Mesh,
    axis: str = "fsdp",
    min_weight_size: int = 2 ** 12,
) -> Any:
    """Shard each parameter leaf's largest divisible dim over ``axis``.

    Small leaves (biases, norms, scalars) stay replicated — sharding them
    costs more in collective latency than it saves in memory.
    """
    axis_size = mesh.shape[axis]

    def rule(leaf):
        if axis_size == 1 or np.prod(leaf.shape) < min_weight_size:
            return NamedSharding(mesh, P())
        # choose the largest dim divisible by axis_size
        best = None
        for i, d in enumerate(leaf.shape):
            if d % axis_size == 0 and (best is None or d > leaf.shape[best]):
                best = i
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, params)


def replicated_sharding(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)


def batch_sharding(mesh: Mesh, batch_axes=("dp", "fsdp")) -> NamedSharding:
    """Shard the leading (batch) dim over the data axes jointly."""
    axes = tuple(a for a in batch_axes if a in mesh.shape and mesh.shape[a] > 1)
    if not axes:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axes))


def shard_params(params: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
