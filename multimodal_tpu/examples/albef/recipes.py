"""ALBEF fine-tuning recipe schedules.

Pure-function re-expression of the reference retrieval fine-tune loop's
training schedule (``examples/albef/finetune_retrieval.py:30-75``):

- distillation ``alpha`` ramps linearly 0 -> alpha over epoch 0, then stays
  constant (``:59-62``);
- the LR follows torch's ``CosineAnnealingWarmRestarts(T_0=max_epochs,
  eta_min)`` with the reference's quirky stepping: during epoch 0 the
  scheduler is stepped to ``batch // step_size`` every ``step_size`` batches
  while ``batch <= warmup_steps * step_size`` (a staircase ride up the start
  of the cosine); from epoch 1 it is stepped once per epoch to
  ``epoch + warmup_steps`` (``:54-56,74-75``).

Both are jit-safe (pure jnp) so they can live inside the train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def albef_alpha_schedule(epoch, batch, batches_per_epoch, alpha: float = 0.4):
    """Distillation weight: linear 0->alpha during epoch 0, else alpha."""
    epoch = jnp.asarray(epoch)
    ramp = alpha * jnp.minimum(1.0, jnp.asarray(batch) / batches_per_epoch)
    return jnp.where(epoch > 0, alpha, ramp)


def albef_cosine_lr(
    epoch,
    batch,
    lr: float = 1e-5,
    min_lr: float = 1e-6,
    max_epochs: int = 6,
    warmup_steps: int = 1,
    step_size: int = 100,
):
    """LR at (epoch, batch) under the reference's scheduler stepping."""
    epoch = jnp.asarray(epoch)
    batch = jnp.asarray(batch)
    warmup_iterations = warmup_steps * step_size
    # epoch 0: last scheduler step was floor(batch/step_size), frozen once
    # batch passes warmup_iterations
    t0 = jnp.minimum(batch // step_size, warmup_iterations // step_size)
    # epoch >= 1: stepped to epoch + warmup_steps at the top of the epoch
    t_cur = jnp.where(epoch > 0, epoch + warmup_steps, t0)
    t_mod = t_cur % max_epochs
    cos = (1.0 + jnp.cos(jnp.pi * t_mod / max_epochs)) / 2.0
    return min_lr + (lr - min_lr) * cos
