"""Normalization layers with explicit fp32 compute under low-precision params.

Parity with reference ``modules/layers/normalizations.py`` (Fp32LayerNorm:13,
Fp32GroupNorm:28, RMSNorm:51, SimpleRMSNorm:77). On TPU the bf16-params /
fp32-statistics split is the critical numerics detail for matching the
PyTorch reference under mixed precision.
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn


class Fp32LayerNorm(nn.Module):
    """LayerNorm computed in fp32, output cast back to the input dtype."""

    eps: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.eps,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class Fp32GroupNorm(nn.Module):
    """GroupNorm computed in fp32 over channel-last inputs."""

    num_groups: int
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class RMSNorm(nn.Module):
    """Root-mean-square norm with learnable scale; statistics in fp32."""

    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype
        )
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale.astype(jnp.float32)
        return y.astype(orig_dtype)


class SimpleRMSNorm(nn.Module):
    """Parameter-free RMS norm: ``x / sqrt(mean(x^2) + eps)`` in fp32."""

    eps: float = 1e-12

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        # Reference SimpleRMSNorm (normalizations.py:77) scales by sqrt(d):
        # x * d^{-1/2} normalised by the L2 norm == x / sqrt(mean(x^2)).
        norm = jnp.linalg.norm(x32, axis=-1, keepdims=True)
        d = x.shape[-1]
        y = x32 * (d ** 0.5) / jnp.maximum(norm, self.eps)
        return y.astype(orig_dtype)
