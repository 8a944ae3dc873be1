"""A Dense layer's parameters WITHOUT its matmul.

``DenseParams(features, name="linear1")(in_features)`` creates exactly the
param pytree ``nn.Dense(features, name="linear1")`` would (``kernel``
(in, out) lecun-normal, ``bias`` (out,) zeros) and returns the raw arrays,
so a layer can route the same checkpoint-compatible weights through either
the plain XLA matmul or a fused Pallas kernel
(``ops/fused_encoder.fused_mlp``) without changing the parameter tree that
converters (``utils/checkpoint.py``) and sharding rules address.
"""

from __future__ import annotations

import contextlib
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

# Layers that route weights around nn.Dense (DenseParams + fused Pallas
# kernels) are invisible to nn.intercept_methods hooks. Interceptor-based
# features (serving/multi_lora.py's per-request adapters) enter this scope
# so those layers fall back to plain nn.Dense calls — same parameter tree,
# every adapted matmul visible at the module boundary.
_INTERCEPT_DEPTH = 0


@contextlib.contextmanager
def dense_interception():
    """Within this scope, fast paths that bypass ``nn.Dense`` must defer to
    module-boundary Dense calls (checked via ``dense_interception_active``)."""
    global _INTERCEPT_DEPTH
    _INTERCEPT_DEPTH += 1
    try:
        yield
    finally:
        _INTERCEPT_DEPTH -= 1


def dense_interception_active() -> bool:
    return _INTERCEPT_DEPTH > 0


class DenseParams(nn.Module):
    features: int
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_features: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), self.param_dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros_init(),
                (self.features,), self.param_dtype,
            )
            if self.use_bias
            else None
        )
        return kernel, bias


def dense_apply(x, kernel, bias, dtype):
    """``nn.Dense.__call__``'s numerics on raw arrays: cast everything to
    the compute dtype, matmul, add bias."""
    x = x.astype(dtype)
    y = x @ kernel.astype(dtype)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y
