"""Model-level sequence/context parallelism (SURVEY §5.7 first-class
capability; round-3 integration of ``parallel.context_parallel``).

The rings in ``context_parallel.py`` are shard-level SPMD functions; this
module is the bridge that lets a *model* use them: transformer layers carry
a ``cp_axis_name`` field and route self-attention through
``sequence_parallel_self_attention``, which wraps the ring in ``shard_map``
over the ambient mesh — batch over the data axes, heads over ``tp``,
sequence over the ``cp`` axis — while the rest of the network (MLPs, norms,
embeddings) stays plain GSPMD-jitted code. Nothing else in the model needs
to know the sequence is sharded: pointwise-over-sequence ops are
layout-independent, and cross-attention with replicated K/V parallelizes
trivially under GSPMD.

Layout: causal attention runs the load-balanced zigzag ring. A model can
either leave ``cp_layout="contiguous"`` (each attention call zigzag-splits
and restores around the ring — two extra collective-permutes per layer), or
pre-split once after the embedding with ``shard_sequence_for_cp`` /
``unshard_sequence_for_cp`` and set ``cp_layout="zigzag"`` so every layer's
ring runs directly on the balanced layout (the long-context GPT recipe does
this).

Requires the training step to run under ``jax.set_mesh(mesh)`` (the
``Trainer`` does) so the ambient abstract mesh is visible here; a concrete
``mesh=`` can also be passed explicitly (tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_tpu.parallel.context_parallel import (
    context_parallel_attention,
    zigzag_context_parallel_attention,
    zigzag_restore,
    zigzag_split,
)

_BATCH_AXES = ("dcn", "dp", "fsdp")
_HEAD_AXIS = "tp"


def resolve_cp_mesh(cp_axis_name: str, mesh=None):
    """The mesh carrying the cp axis: explicit ``mesh`` or the ambient
    abstract mesh (set by ``jax.set_mesh`` — the Trainer enters it)."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or getattr(mesh, "empty", False):
        raise ValueError(
            "sequence parallelism needs a mesh: run the step under "
            "jax.set_mesh(mesh) (training.Trainer does) or pass mesh="
        )
    if cp_axis_name not in mesh.shape:
        raise ValueError(
            f"mesh {dict(mesh.shape)} has no '{cp_axis_name}' axis"
        )
    return mesh


def _batch_spec(mesh, batch_size: int):
    """Data axes whose product divides the batch (drop from the right)."""
    axes = [a for a in _BATCH_AXES if a in mesh.shape and mesh.shape[a] > 1]
    while axes:
        prod = 1
        for a in axes:
            prod *= mesh.shape[a]
        if batch_size % prod == 0:
            break
        axes.pop()
    return tuple(axes) if axes else None


def sequence_parallel_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cp_axis_name: str,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    layout: str = "contiguous",
    impl: str = "flash",
    mesh=None,
) -> jnp.ndarray:
    """Self-attention over a sequence sharded on the ``cp`` mesh axis.

    q, k, v: (b, h, s, d) GLOBAL arrays inside the jitted step. The ring
    runs inside ``shard_map``; each per-ring-step block goes through the
    Pallas flash kernel (``impl="flash"``). ``causal=True`` uses the
    zigzag-balanced ring; with ``layout="contiguous"`` the zigzag
    split/restore happens here (per call), with ``layout="zigzag"`` inputs
    are assumed pre-split (``shard_sequence_for_cp``) and the output is
    returned still zigzag-laid-out.
    """
    mesh = resolve_cp_mesh(cp_axis_name, mesh)
    n = mesh.shape[cp_axis_name]
    if n == 1:
        from multimodal_tpu.ops.attention import scaled_dot_product_attention

        return scaled_dot_product_attention(
            q, k, v, is_causal=causal, sm_scale=sm_scale
        )

    b, h, s, _ = q.shape
    if s % n != 0:
        raise ValueError(f"sequence length {s} not divisible by cp={n}")
    if causal and (s % (2 * n) != 0):
        raise ValueError(
            f"causal (zigzag) cp needs seq divisible by 2*cp={2 * n}, got {s}"
        )

    head_axis = (
        _HEAD_AXIS
        if _HEAD_AXIS in mesh.shape and mesh.shape[_HEAD_AXIS] > 1
        and h % mesh.shape[_HEAD_AXIS] == 0
        else None
    )
    spec = P(_batch_spec(mesh, b), head_axis, cp_axis_name, None)

    split_here = causal and layout == "contiguous"
    if split_here:
        q = zigzag_split(q, n, axis=2)
        k = zigzag_split(k, n, axis=2)
        v = zigzag_split(v, n, axis=2)

    def body(q_, k_, v_):
        if causal:
            return zigzag_context_parallel_attention(
                q_, k_, v_, cp_axis_name, sm_scale=sm_scale, impl=impl
            )
        return context_parallel_attention(
            q_, k_, v_, cp_axis_name, sm_scale=sm_scale, causal=False, impl=impl
        )

    # check_vma=False: pallas_call outputs don't carry varying-mesh-axis
    # metadata, so the static replication checker can't type them (JAX 0.9)
    out = jax.shard_map(
        body, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec, check_vma=False
    )(q, k, v)
    if split_here:
        out = zigzag_restore(out, n, axis=2)
    return out


def shard_sequence_for_cp(
    x: jnp.ndarray,
    cp_axis_name: str,
    *,
    causal: bool = True,
    seq_axis: int = 1,
    mesh=None,
) -> jnp.ndarray:
    """Apply ONCE after embeddings (positions already added): reorders the
    sequence axis into the zigzag layout so every decoder layer with
    ``cp_layout='zigzag'`` runs its balanced causal ring without per-layer
    permutes. Identity for bidirectional models or cp=1."""
    mesh = resolve_cp_mesh(cp_axis_name, mesh)
    n = mesh.shape[cp_axis_name]
    if not causal or n == 1:
        return x
    return zigzag_split(x, n, axis=seq_axis)


def unshard_sequence_for_cp(
    x: jnp.ndarray,
    cp_axis_name: str,
    *,
    causal: bool = True,
    seq_axis: int = 1,
    mesh=None,
) -> jnp.ndarray:
    """Inverse of ``shard_sequence_for_cp`` (apply before the LM head /
    loss so logits line up with labels in natural order)."""
    mesh = resolve_cp_mesh(cp_axis_name, mesh)
    n = mesh.shape[cp_axis_name]
    if not causal or n == 1:
        return x
    return zigzag_restore(x, n, axis=seq_axis)
