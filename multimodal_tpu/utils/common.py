"""Small shared utilities.

Capability parity with the reference's ``torchmultimodal/utils/common.py``
(shift_dim:26, tensor_slice:69, to_tuple_tuple, ModelOutput) — re-designed
for JAX: everything here is pure and jit-safe.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp


class ModelOutput:
    """Marker base class for typed model outputs.

    Subclasses should be ``flax.struct.dataclass`` or ``typing.NamedTuple``
    pytrees so they flow through jit/grad transparently.
    """


def shift_dim(x: jnp.ndarray, src_dim: int = -1, dest_dim: int = -1) -> jnp.ndarray:
    """Move dimension ``src_dim`` of ``x`` to position ``dest_dim``.

    Mirrors reference ``utils/common.py:26`` (shift_dim) semantics.
    """
    n_dims = x.ndim
    if src_dim < 0:
        src_dim = n_dims + src_dim
    if dest_dim < 0:
        dest_dim = n_dims + dest_dim
    assert 0 <= src_dim < n_dims and 0 <= dest_dim < n_dims
    dims = list(range(n_dims))
    del dims[src_dim]
    dims.insert(dest_dim, src_dim)
    return jnp.transpose(x, dims)


def tensor_slice(x: jnp.ndarray, begin: Sequence[int], size: Sequence[int]) -> jnp.ndarray:
    """Slice ``x`` with per-dim (begin, size); size -1 means 'to the end'.

    Mirrors reference ``utils/common.py:69`` (tensor_slice).
    """
    size = [x.shape[i] - begin[i] if s == -1 else s for i, s in enumerate(size)]
    slices = tuple(slice(b, b + s) for b, s in zip(begin, size))
    return x[slices]


def momentum_update(params: Any, params_m: Any, momentum: float) -> Any:
    """EMA update of a momentum param pytree (pure).

    Functional analog of reference ``utils/common.py:116`` (momentum_update,
    which mutates the momentum model in place under no_grad): returns the new
    momentum tree; callers thread it through the train step.
    """
    import jax

    return jax.tree_util.tree_map(
        lambda p, m: m * momentum + jax.lax.stop_gradient(p) * (1.0 - momentum),
        params,
        params_m,
    )


def remove_grad(params: Any) -> Any:
    """stop_gradient over a pytree (analog of reference utils/common.py:122)."""
    import jax

    return jax.tree_util.tree_map(jax.lax.stop_gradient, params)


def to_tuple_tuple(param: Any, dim_tuple: int, num_tuple: int) -> Tuple:
    """Convert an int or tuple to a tuple of ``num_tuple`` tuples of length
    ``dim_tuple`` (used by 3-D conv stacks; reference ``utils/common.py``)."""
    if isinstance(param, int):
        param = (param,) * dim_tuple
    if isinstance(param, tuple) and all(isinstance(p, int) for p in param):
        param = (param,) * num_tuple
    return tuple(param)
