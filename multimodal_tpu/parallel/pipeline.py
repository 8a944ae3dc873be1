"""Pipeline parallelism (GPipe schedule) over a ``pp`` mesh axis.

New capability vs the reference (SURVEY §2.8 lists pipeline parallel as
absent upstream). TPU-native design per the scaling-book recipe: the stage
loop is a ``lax.scan`` inside ``shard_map``, activations move between
neighbouring stages with ``lax.ppermute`` (one ICI hop per tick), and the
backward pass falls out of JAX autodiff — ``ppermute``'s transpose is the
reverse permute, so ``jax.grad`` of a pipelined loss IS the backward
pipeline, no hand-written schedule needed.

Layout contract:
  - stage params are stacked on a leading ``n_stages`` dim and sharded
    ``P('pp')`` so each device holds exactly its stage's weights;
  - the input is pre-split into microbatches ``(n_micro, mb, ...)``;
  - every stage must map activations to activations of the same shape
    (transformer blocks do).

The GPipe bubble is ``(S-1) / (n_micro + S-1)`` of the ticks; utilization
improves with more microbatches, exactly as upstream implementations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def split_microbatches(x: jnp.ndarray, n_micro: int) -> jnp.ndarray:
    """(B, ...) -> (n_micro, B // n_micro, ...)."""
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by {n_micro} microbatches")
    return x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])


def merge_microbatches(x: jnp.ndarray) -> jnp.ndarray:
    """(n_micro, mb, ...) -> (n_micro * mb, ...)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def stack_stage_params(layer_init: Callable, rng: jax.Array, n_stages: int, *args):
    """Init one stage module ``n_stages`` times with split rngs and stack the
    param trees on a new leading dim (the layout ``pipeline_apply`` expects)."""
    rngs = jax.random.split(rng, n_stages)
    trees = [layer_init(r, *args) for r in rngs]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *trees)


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stage_params: Any,
    x_micro: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "pp",
    data_spec: Optional[P] = None,
    remat_stage: bool = True,
) -> jnp.ndarray:
    """Run ``n_micro`` microbatches through an ``n_stages``-deep pipeline.

    Args:
      stage_fn: ``(params_one_stage, activation) -> activation``; applied by
        every device to its own stage's params.
      stage_params: pytree with leading dim ``n_stages`` on every leaf.
      x_micro: ``(n_micro, mb, ...)`` microbatched input.
      mesh: mesh containing ``axis_name``.
      data_spec: PartitionSpec for the per-microbatch dims of ``x_micro``
        (e.g. ``P(None, 'dp')`` to keep the microbatch dim dp-sharded);
        defaults to replicated.
      remat_stage: rematerialize each stage call (activation checkpointing
        across the pipeline, the memory-sane default for training).

    Returns:
      ``(n_micro, mb, ...)`` last-stage outputs, replicated over
      ``axis_name`` (a masked psum broadcasts them off the last stage).
    """
    n_stages = mesh.shape[axis_name]
    n_micro = x_micro.shape[0]
    fn = jax.checkpoint(stage_fn) if remat_stage else stage_fn
    xs_spec = data_spec if data_spec is not None else P(*([None] * x_micro.ndim))

    def _pipeline(params, xs):
        params = jax.tree_util.tree_map(lambda l: l[0], params)  # this stage's slice
        stage = jax.lax.axis_index(axis_name)
        ticks = n_micro + n_stages - 1
        pad = jnp.zeros((n_stages - 1,) + xs.shape[1:], xs.dtype)
        xs_padded = jnp.concatenate([xs, pad], axis=0)
        outputs = jnp.zeros_like(xs)

        # scan over ticks; the tick index rides along as a scanned input
        def tick_indexed(carry, xt):
            t, x_t = xt
            received, outputs = carry
            inp = jnp.where(stage == 0, x_t, received)
            out = fn(params, inp)
            idx = t - (n_stages - 1)
            valid = (idx >= 0) & (idx < n_micro) & (stage == n_stages - 1)
            idx_c = jnp.clip(idx, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, idx_c, 0, keepdims=False)
            new = jnp.where(valid, out, cur)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, new, idx_c, 0)
            received = jax.lax.ppermute(
                out, axis_name, [(i, i + 1) for i in range(n_stages - 1)]
            )
            return (received, outputs), None

        init = (jnp.zeros(xs.shape[1:], xs.dtype), outputs)
        (_, outputs), _ = jax.lax.scan(
            tick_indexed, init, (jnp.arange(ticks), xs_padded)
        )
        # broadcast last-stage outputs everywhere (masked psum)
        is_last = (stage == n_stages - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * is_last, axis_name)

    return jax.shard_map(
        _pipeline,
        mesh=mesh,
        in_specs=(P(axis_name), xs_spec),
        out_specs=xs_spec,
        check_vma=False,
    )(stage_params, x_micro)
