"""AnyPrecision AdamW as an optax gradient transformation.

Parity with reference ``modules/optimizers/anyprecision.py:17``
(AnyPrecisionAdamW): AdamW with user-controlled momentum/variance dtypes
(bf16 states halve optimizer memory) and optional Kahan-compensated weight
updates so pure-bf16 training matches fp32 master-weight quality.

TPU-native design: a single fused optax transform — XLA fuses the whole
update into one kernel per parameter; state dtypes are explicit pytrees.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class AnyPrecisionAdamWState(NamedTuple):
    count: jnp.ndarray
    momentum: Any
    variance: Any
    compensation: Optional[Any]


def anyprecision_adamw(
    learning_rate: optax.ScalarOrSchedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    use_kahan_summation: bool = False,
    momentum_dtype: jnp.dtype = jnp.float32,
    variance_dtype: jnp.dtype = jnp.bfloat16,
    compensation_buffer_dtype: jnp.dtype = jnp.bfloat16,
) -> optax.GradientTransformation:
    """AdamW with reduced-precision states + Kahan-compensated updates.

    With ``use_kahan_summation=True`` params may be kept in bf16; the
    compensation buffer accumulates the rounding error of each update
    (reference anyprecision.py:136-153 semantics).
    """

    def init_fn(params):
        momentum = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=momentum_dtype), params
        )
        variance = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=variance_dtype), params
        )
        compensation = None
        if use_kahan_summation:
            compensation = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=compensation_buffer_dtype), params
            )
        return AnyPrecisionAdamWState(
            jnp.zeros([], jnp.int32), momentum, variance, compensation
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("anyprecision_adamw requires params")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def upd(g, p, m, v, c):
            g32 = g.astype(jnp.float32)
            m = (b1 * m.astype(jnp.float32) + (1 - b1) * g32).astype(momentum_dtype)
            v = (b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32).astype(variance_dtype)

            bc1 = 1 - b1 ** count.astype(jnp.float32)
            bc2_sqrt = jnp.sqrt(1 - b2 ** count.astype(jnp.float32))

            # decoupled weight decay
            decay = -lr * weight_decay * p.astype(jnp.float32)
            step = -(lr / bc1) * m.astype(jnp.float32) / (
                jnp.sqrt(v.astype(jnp.float32)) / bc2_sqrt + eps
            )
            full_update = (decay + step).astype(jnp.float32)

            if use_kahan_summation:
                # compensated update in the param's (possibly bf16) precision
                compensated = full_update + c.astype(jnp.float32)
                new_p = (p.astype(jnp.float32) + compensated).astype(p.dtype)
                # error = intended - realized
                realized = new_p.astype(jnp.float32) - p.astype(jnp.float32)
                new_c = (compensated - realized).astype(compensation_buffer_dtype)
                update = (new_p.astype(jnp.float32) - p.astype(jnp.float32)).astype(p.dtype)
                return update, m, v, new_c
            return full_update.astype(p.dtype), m, v, c

        comp = state.compensation
        if comp is None:
            comp = jax.tree_util.tree_map(lambda p: None, params)

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.momentum)
        flat_v = treedef.flatten_up_to(state.variance)
        flat_c = (
            treedef.flatten_up_to(state.compensation)
            if state.compensation is not None
            else [None] * len(flat_p)
        )
        results = [
            upd(g, p, m, v, c)
            for g, p, m, v, c in zip(flat_g, flat_p, flat_m, flat_v, flat_c)
        ]
        updates = treedef.unflatten([r[0] for r in results])
        momentum = treedef.unflatten([r[1] for r in results])
        variance = treedef.unflatten([r[2] for r in results])
        compensation = (
            treedef.unflatten([r[3] for r in results]) if use_kahan_summation else None
        )
        return updates, AnyPrecisionAdamWState(count, momentum, variance, compensation)

    return optax.GradientTransformation(init_fn, update_fn)
