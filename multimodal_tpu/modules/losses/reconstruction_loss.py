"""MAE reconstruction loss.

Parity with reference ``modules/losses/reconstruction_loss.py:10``
(ReconstructionLoss): MSE over masked patches only, optional per-patch
target normalization. Pure function (jit-safe; the reference's
"mask.sum()==0" guard becomes a divide-by-max(sum,1))."""

from __future__ import annotations

import jax.numpy as jnp


def reconstruction_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    normalize_target: bool = True,
) -> jnp.ndarray:
    """pred/target: (b, n_patches, patch_dim); mask: (b, n_patches), 1 = masked."""
    target = target.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if normalize_target:
        mean = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True, ddof=1)
        target = (target - mean) / jnp.sqrt(var + 1.0e-6)
    loss = jnp.mean((pred - target) ** 2, axis=-1)
    mask = mask.astype(jnp.float32)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class ReconstructionLoss:
    def __init__(self, normalize_target: bool = True):
        self.normalize_target = normalize_target

    def __call__(self, pred, target, mask):
        return reconstruction_loss(pred, target, mask, self.normalize_target)
