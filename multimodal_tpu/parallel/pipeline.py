"""Pipeline parallelism over a ``pp`` mesh axis.

New capability vs the reference (SURVEY §2.8 lists pipeline parallel as
absent upstream). TPU-native design per the scaling-book recipe: the stage
loop is a ``lax.scan`` inside ``shard_map``, activations move between
neighbouring stages with ``lax.ppermute`` (one ICI hop per tick), and the
backward pass falls out of JAX autodiff — ``ppermute``'s transpose is the
reverse permute, so ``jax.grad`` of a pipelined loss IS the backward
pipeline, no hand-written schedule needed.

Two entry points:

``pipeline_apply`` — the homogeneous GPipe op: stage params stacked on a
leading ``n_stages`` dim, every stage the same shape-preserving function.
Kept for op-level uses and composition tests.

``pipeline_stages_apply`` — the MODEL capability: heterogeneous
embed / K-blocks-per-stage / head pipelining with an optional interleaved
(circular, Megatron-style virtual-stage) schedule. Stage 0 additionally
runs ``first_fn`` (e.g. token+position embedding), every device scans its
``K`` transformer blocks per virtual chunk, and the last stage additionally
runs ``last_fn`` (e.g. final-norm + LM head + per-example loss). With
``n_virtual=V`` each device holds ``V`` chunks (device ``s`` owns global
chunks ``r*S + s``); activations wrap from the last device back to device 0
over the ring, cutting the bubble from ``(S-1)/(M+S-1)`` to
``(S-1)/(V*M+S-1)`` of total ticks. The schedule is the standard circular
one: microbatch ``m``, repeat ``r`` executes on stage ``s`` at tick
``t = r*M + m + s`` (requires ``M >= S`` when ``V > 1`` so a wrapped
activation never arrives after it is needed).

Layout contract for ``pipeline_stages_apply``:
  - block params are stacked ``(n_virtual, n_stages, K, ...)`` on every
    leaf and sharded ``P(None, 'pp')`` so each device holds exactly its
    ``V*K`` blocks' weights;
  - ``first_params``/``last_params`` are replicated over ``pp`` (embedding
    tables typically appear at both ends anyway when tied);
  - inputs are a pytree of ``(n_micro, mb, ...)`` leaves; outputs are
    whatever ``last_fn`` returns, stacked to ``(n_micro, ...)``.
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


def stack_block_params(layer_trees, n_stages: int, n_virtual: int = 1):
    """Stack ``L = n_virtual * n_stages * K`` per-layer param trees into the
    ``(n_virtual, n_stages, K, ...)`` layout ``pipeline_stages_apply``
    expects. Chunk ``c = r * n_stages + s`` (device ``s``, repeat ``r``)
    holds layers ``[c*K, (c+1)*K)`` — contiguous model order."""
    L = len(layer_trees)
    if L % (n_stages * n_virtual):
        raise ValueError(
            f"{L} layers not divisible by n_stages*n_virtual="
            f"{n_stages * n_virtual}"
        )
    k = L // (n_stages * n_virtual)
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layer_trees)
    return jax.tree_util.tree_map(
        lambda l: l.reshape((n_virtual, n_stages, k) + l.shape[1:]), stacked
    )


def unstack_block_params(blocks):
    """Inverse of ``stack_block_params``: list of L per-layer trees."""
    leaves = jax.tree_util.tree_leaves(blocks)
    v, s, k = leaves[0].shape[:3]
    flat = jax.tree_util.tree_map(
        lambda l: l.reshape((v * s * k,) + l.shape[3:]), blocks
    )
    return [
        jax.tree_util.tree_map(lambda l: l[i], flat) for i in range(v * s * k)
    ]


def pipeline_stages_apply(
    first_fn: Callable[[Any, Any], jnp.ndarray],
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    last_fn: Callable[[Any, jnp.ndarray, Any], Any],
    first_params: Any,
    block_params: Any,
    last_params: Any,
    xs: Any,
    mesh: Mesh,
    axis_name: str = "pp",
    n_virtual: int = 1,
    data_spec: Optional[P] = None,
    out_spec: Optional[P] = None,
    remat_block: bool = True,
):
    """Heterogeneous (embed / blocks / head) pipeline with an optional
    interleaved circular schedule. See module docstring for the layout and
    schedule contract.

    Args:
      first_fn: ``(first_params, x_item) -> act`` — runs ONLY on stage 0
        (entering microbatches). ``x_item`` is one microbatch slice of
        ``xs`` (leading ``n_micro`` dim removed). No collectives allowed.
      block_fn: ``(one_block_params, act) -> act`` — shape-preserving; each
        device scans it over its chunk's ``K`` stacked blocks.
      last_fn: ``(last_params, act, x_item) -> out`` — runs ONLY on the
        last stage (e.g. head + per-example loss; gets ``x_item`` for
        targets). Output leaves are collected to ``(n_micro, ...)``.
      block_params: pytree, every leaf ``(n_virtual, n_stages, K, ...)``.
      xs: pytree of ``(n_micro, mb, ...)`` leaves.
      data_spec: PartitionSpec for ``xs`` leaves (e.g. ``P(None, 'dp')``);
        also the default for outputs. Keep per-example structure in
        ``last_fn``'s output (e.g. per-example loss ``(mb,)``) so outputs
        stay valid under a dp-sharded spec.
      n_virtual: virtual chunks per device (circular schedule when > 1).
    """
    S = mesh.shape[axis_name]
    V = n_virtual
    x_leaves = jax.tree_util.tree_leaves(xs)
    M = x_leaves[0].shape[0]
    if V > 1 and M < S:
        raise ValueError(
            f"circular schedule needs n_micro >= n_stages ({M} < {S}): a "
            "wrapped activation would arrive after its tick"
        )
    b_leaves = jax.tree_util.tree_leaves(block_params)
    if any(l.shape[0] != V or l.shape[1] != S for l in b_leaves):
        raise ValueError(
            "block_params leaves must lead with (n_virtual, n_stages); got "
            f"{b_leaves[0].shape[:2]} for V={V}, S={S}"
        )
    bfn = jax.checkpoint(block_fn) if remat_block else block_fn
    xs_spec = data_spec if data_spec is not None else P()
    o_spec = out_spec if out_spec is not None else xs_spec

    def _pipeline(first_p, blocks_p, last_p, xs):
        stage = jax.lax.axis_index(axis_name)
        # this device's V chunks, each (K, ...)
        blocks_p = jax.tree_util.tree_map(lambda l: l[:, 0], blocks_p)

        x0 = jax.tree_util.tree_map(
            lambda l: jax.ShapeDtypeStruct(l.shape[1:], l.dtype), xs
        )
        act_sds = jax.eval_shape(first_fn, first_p, x0)
        out_sds = jax.eval_shape(last_fn, last_p, act_sds, x0)
        zeros_act = jnp.zeros(act_sds.shape, act_sds.dtype)
        zeros_out = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_sds
        )
        outputs0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros((M,) + s.shape, s.dtype), out_sds
        )
        # wrap-around storage for the circular schedule (activations coming
        # off the last stage, waiting for their next-repeat tick on stage 0)
        circ0 = (
            jnp.zeros((M,) + act_sds.shape, act_sds.dtype) if V > 1 else None
        )
        T = V * M + S - 1

        def tick(carry, t):
            received, circ, outputs = carry
            if V > 1:
                # `received` on stage 0 is last stage's tick-(t-1) output =
                # microbatch (t-S) % M, repeat (t-S) // M; bank it for its
                # stage-0 tick at (r+1)*M + m unless it was the final repeat
                m_wrap = jnp.clip((t - S) % M, 0, M - 1)
                r_wrap = (t - S) // M
                wrap_ok = (t - S >= 0) & (r_wrap < V - 1) & (stage == 0)
                cur = jax.lax.dynamic_index_in_dim(
                    circ, m_wrap, 0, keepdims=False
                )
                circ = jax.lax.dynamic_update_index_in_dim(
                    circ, jnp.where(wrap_ok, received, cur), m_wrap, 0
                )

            tm = t - stage
            valid = (tm >= 0) & (tm < V * M)
            tm_c = jnp.clip(tm, 0, V * M - 1)
            m = tm_c % M
            r = tm_c // M
            x_t = jax.tree_util.tree_map(
                lambda l: jax.lax.dynamic_index_in_dim(l, m, 0, keepdims=False),
                xs,
            )

            def stage0_input():
                if V > 1:
                    stored = jax.lax.dynamic_index_in_dim(
                        circ, m, 0, keepdims=False
                    )
                    return jax.lax.cond(
                        r == 0, lambda: first_fn(first_p, x_t), lambda: stored
                    )
                return first_fn(first_p, x_t)

            inp = jax.lax.cond(
                stage == 0, stage0_input, lambda: received
            )
            chunk = jax.tree_util.tree_map(
                lambda l: jax.lax.dynamic_index_in_dim(l, r, 0, keepdims=False),
                blocks_p,
            )
            act = jax.lax.scan(
                lambda c, bp: (bfn(bp, c), None), inp, chunk
            )[0]

            is_out = valid & (stage == S - 1) & (r == V - 1)
            out = jax.lax.cond(
                stage == S - 1,
                lambda: last_fn(last_p, act, x_t),
                lambda: zeros_out,
            )
            outputs = jax.tree_util.tree_map(
                lambda buf, o: jax.lax.dynamic_update_index_in_dim(
                    buf,
                    jnp.where(
                        is_out,
                        o,
                        jax.lax.dynamic_index_in_dim(buf, m, 0, keepdims=False),
                    ),
                    m,
                    0,
                ),
                outputs,
                out,
            )
            perm = (
                [(i, (i + 1) % S) for i in range(S)]
                if V > 1
                else [(i, i + 1) for i in range(S - 1)]
            )
            received = jax.lax.ppermute(act, axis_name, perm)
            return (received, circ, outputs), None

        (_, _, outputs), _ = jax.lax.scan(
            tick, (zeros_act, circ0, outputs0), jnp.arange(T)
        )
        # broadcast collected outputs off the last stage (masked psum)
        is_last = stage == S - 1
        outputs = jax.tree_util.tree_map(
            lambda o: jax.lax.psum(
                jnp.where(is_last, o, jnp.zeros_like(o)), axis_name
            ),
            outputs,
        )
        return outputs

    return jax.shard_map(
        _pipeline,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(), xs_spec),
        out_specs=o_spec,
        check_vma=False,
    )(first_params, block_params, last_params, xs)
