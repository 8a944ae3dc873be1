"""Shared test harness.

Analog of reference ``tests/test_utils.py``: assert_expected /
assert_expected_namedtuple golden checks, deterministic fixed-init tensors
(arange/sin), and rng seeding — re-expressed for JAX pytrees.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def assert_expected(actual, expected, rtol: float = 1e-5, atol: float = 1e-5):
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=rtol, atol=atol
    )


def assert_expected_namedtuple(actual: Any, expected: Any, rtol=1e-5, atol=1e-5):
    """Recursively compare nested namedtuples/dicts; (shape, sum) tuples are
    treated as compressed goldens (reference test_utils.py:121-190)."""
    if expected is None:
        assert actual is None, f"expected None, got {type(actual)}"
        return
    if isinstance(expected, tuple) and len(expected) == 2 and isinstance(expected[0], tuple):
        shape, total = expected
        assert tuple(actual.shape) == shape, f"{actual.shape} != {shape}"
        assert_expected(jnp.sum(actual), total, rtol=rtol, atol=max(atol, 1e-3))
        return
    if hasattr(expected, "_fields"):
        for f in expected._fields:
            assert_expected_namedtuple(getattr(actual, f), getattr(expected, f), rtol, atol)
        return
    if isinstance(expected, dict):
        for k in expected:
            assert_expected_namedtuple(actual[k], expected[k], rtol, atol)
        return
    if isinstance(expected, (list, tuple)):
        assert len(actual) == len(expected)
        for a, e in zip(actual, expected):
            assert_expected_namedtuple(a, e, rtol, atol)
        return
    assert_expected(actual, expected, rtol, atol)


def fixed_init_tensor(shape, fill: float = 0.0) -> jnp.ndarray:
    """Deterministic tensor: sin over arange (reference test_utils.py:256)."""
    size = int(np.prod(shape))
    x = np.arange(size, dtype=np.float32).reshape(shape)
    return jnp.asarray(np.sin(x) + fill)


def fixed_init_params(params):
    """Replace every leaf of a param pytree with fixed_init values."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    new_leaves = [fixed_init_tensor(l.shape).astype(l.dtype) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def init_weights_with_constant(params, constant: float = 1.0):
    return jax.tree_util.tree_map(
        lambda l: jnp.full(l.shape, constant, l.dtype), params
    )


def rng(seed: int = 0) -> jax.Array:
    return jax.random.PRNGKey(seed)
