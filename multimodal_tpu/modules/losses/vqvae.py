"""VQ-VAE commitment loss.

Parity with reference ``modules/losses/vqvae.py:13`` (CommitmentLoss):
MSE between encoder outputs and (detached) quantized vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def commitment_loss(
    quantized: jnp.ndarray, encoded: jnp.ndarray, commitment_cost: float = 1.0
) -> jnp.ndarray:
    q = jax.lax.stop_gradient(quantized).astype(jnp.float32)
    e = encoded.astype(jnp.float32)
    return jnp.mean((q - e) ** 2) * commitment_cost


class CommitmentLoss:
    def __init__(self, commitment_cost: float = 1.0):
        self.commitment_cost = commitment_cost

    def __call__(self, quantized, encoded):
        return commitment_loss(quantized, encoded, self.commitment_cost)
