"""Mixture-of-Experts feedforward with expert parallelism.

New capability vs the reference (SURVEY §2.8 lists expert parallel as
absent upstream): a GShard/Switch-style sparsely-activated MLP that drops
into ``TransformerEncoderLayer``/``TransformerDecoderLayer`` in place of the
dense ``MLP``.

TPU-native design:
  - **Static shapes**: tokens are routed with capacity-based dispatch
    (one-hot dispatch/combine tensors + einsums), so every step compiles to
    the same program — no data-dependent shapes, no host round-trips. The
    dispatch einsums and the per-expert matmuls are all large batched GEMMs
    that tile onto the MXU.
  - **Expert parallelism over an ``ep`` mesh axis**: expert-major tensors
    (``(E, G, C, D)``) carry a ``with_sharding_constraint`` on the expert
    dim. Under GSPMD that one annotation makes XLA insert the
    all-to-all pair (tokens -> experts -> tokens) over ICI; nothing else in
    the model needs to know. Requires the step to run under
    ``jax.set_mesh(mesh)`` or ``with mesh:`` (the ``Trainer`` does both).
  - **fp32 routing**: router logits/softmax/top-k run in fp32 regardless of
    activation dtype (the same numerics guard as ``Fp32LayerNorm``).

Aux losses (load-balance and router-z) are sown into the ``intermediates``
collection; ``moe_aux_loss`` collects them for the training objective.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.activation import get_activation


def _maybe_constrain_expert_axis(x: jnp.ndarray, ep_axis_name: Optional[str]):
    """Constrain dim 0 (experts) to the ``ep`` mesh axis when a mesh with
    that axis is ambient; silently a no-op otherwise so the layer runs
    unsharded (single device, tests, eval tools)."""
    if ep_axis_name is None:
        return x
    try:
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, P(ep_axis_name, *([None] * (x.ndim - 1)))
        )
    except (RuntimeError, ValueError, KeyError):
        # no ambient mesh, or the mesh lacks the axis: run unsharded
        return x


class MoEFeedForward(nn.Module):
    """Top-k routed mixture-of-experts MLP (GShard dispatch, Switch aux loss).

    Call signature matches ``MLP``: ``(x, deterministic=True) -> y`` with
    ``x: (batch, seq, dim)``. Each batch row is a routing group (tokens
    compete for expert capacity within their own sequence, which keeps the
    dispatch tensors small and the load metrics per-example).
    """

    dim: int
    hidden_dim: int
    num_experts: int
    num_experts_per_token: int = 2
    capacity_factor: float = 1.25
    eval_capacity_factor: Optional[float] = None  # defaults to capacity_factor
    min_capacity: int = 4
    activation: Union[str, Callable] = "gelu"
    ep_axis_name: Optional[str] = None
    router_jitter: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if x.ndim != 3:
            raise ValueError(f"MoEFeedForward expects (batch, seq, dim), got {x.shape}")
        g, s, d = x.shape
        e = self.num_experts
        k = self.num_experts_per_token
        if k > e:
            raise ValueError(f"top-k {k} > num_experts {e}")
        cf = self.capacity_factor if not deterministic else (
            self.eval_capacity_factor or self.capacity_factor
        )
        c = max(int(math.ceil(s * k * cf / e)), self.min_capacity)
        c = min(c, s * k)

        # --- routing (fp32) ---
        router_in = x.astype(jnp.float32)
        if self.router_jitter > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            router_in = router_in * jax.random.uniform(
                rng, router_in.shape, jnp.float32,
                1.0 - self.router_jitter, 1.0 + self.router_jitter,
            )
        logits = nn.Dense(
            e, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32,
            name="router",
        )(router_in)                                           # (G,S,E)
        probs = jax.nn.softmax(logits, axis=-1)
        gate_vals, expert_idx = jax.lax.top_k(probs, k)        # (G,S,k)
        gate_vals = gate_vals / (gate_vals.sum(-1, keepdims=True) + 1e-9)

        # --- aux losses (Switch: first-choice load balance; router z) ---
        mean_prob = probs.mean(axis=(0, 1))                                # (E,)
        first_frac = jax.nn.one_hot(expert_idx[..., 0], e).mean(axis=(0, 1))
        aux = e * jnp.sum(mean_prob * first_frac)
        z_loss = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
        self.sow("intermediates", "moe_aux_loss", aux)
        self.sow("intermediates", "moe_router_z_loss", z_loss)

        # --- capacity assignment, slot-major priority: every token's first
        # choice claims capacity before any token's second choice ---
        idx_sm = expert_idx.transpose(0, 2, 1).reshape(g, k * s)           # (G,kS)
        gates_sm = gate_vals.transpose(0, 2, 1).reshape(g, k * s)
        mask = jax.nn.one_hot(idx_sm, e, dtype=jnp.float32)                # (G,kS,E)
        pos = jnp.cumsum(mask, axis=1) * mask - 1.0                        # (G,kS,E)
        within = mask * (pos < c)                                          # (G,kS,E)
        dispatch_sm = within[..., None] * jax.nn.one_hot(
            pos.astype(jnp.int32), c, dtype=jnp.float32
        )                                                                  # (G,kS,E,C)
        combine_sm = gates_sm[..., None, None] * dispatch_sm
        dispatch = dispatch_sm.reshape(g, k, s, e, c).sum(1)               # (G,S,E,C)
        combine = combine_sm.reshape(g, k, s, e, c).sum(1)
        self.sow(
            "intermediates", "moe_dropped_frac",
            1.0 - dispatch.sum(axis=(-1, -2)).mean() / k,
        )

        # --- expert computation (expert-major, ep-sharded) ---
        wi = self.param(
            "wi",
            jax.nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
                batch_axis=(0,),
            ),
            (e, d, self.hidden_dim), self.param_dtype,
        )
        wo = self.param(
            "wo",
            jax.nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
                batch_axis=(0,),
            ),
            (e, self.hidden_dim, d), self.param_dtype,
        )
        bi = self.param("bi", nn.initializers.zeros, (e, self.hidden_dim), self.param_dtype)
        bo = self.param("bo", nn.initializers.zeros, (e, d), self.param_dtype)

        act = get_activation(self.activation)
        expert_inputs = jnp.einsum(
            "gsec,gsd->egcd", dispatch.astype(self.dtype), x.astype(self.dtype)
        )
        expert_inputs = _maybe_constrain_expert_axis(expert_inputs, self.ep_axis_name)
        h = jnp.einsum("egcd,edf->egcf", expert_inputs, wi.astype(self.dtype))
        h = act(h + bi.astype(self.dtype)[:, None, None, :])
        out = jnp.einsum("egcf,efd->egcd", h, wo.astype(self.dtype))
        out = out + bo.astype(self.dtype)[:, None, None, :]
        out = _maybe_constrain_expert_axis(out, self.ep_axis_name)
        return jnp.einsum("gsec,egcd->gsd", combine.astype(self.dtype), out)


def moe_aux_loss(
    intermediates: Any,
    aux_weight: float = 0.01,
    z_weight: float = 0.001,
) -> jnp.ndarray:
    """Sum the sown MoE auxiliary losses from an ``intermediates`` collection
    (as returned by ``model.apply(..., mutable=['intermediates'])``),
    weighted: ``aux_weight * mean(load-balance) + z_weight * mean(router-z)``.
    Returns 0.0 when the tree contains no MoE layers.
    """
    aux, z, n_aux, n_z = 0.0, 0.0, 0, 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(intermediates)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "moe_aux_loss" in name:
            aux, n_aux = aux + leaf, n_aux + 1
        elif "moe_router_z_loss" in name:
            z, n_z = z + leaf, n_z + 1
    total = jnp.asarray(0.0, jnp.float32)
    if n_aux:
        total = total + aux_weight * aux / n_aux
    if n_z:
        total = total + z_weight * z / n_z
    return total
