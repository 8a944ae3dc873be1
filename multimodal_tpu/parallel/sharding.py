"""Parameter/batch sharding rules (DDP / FSDP / TP analogs).

TPU-native replacement for the reference's DDP/FSDP wrapping
(``examples/flava/native/train.py:167-211``): instead of a runtime that
shards modules, we annotate a param pytree with ``NamedSharding``s and let
GSPMD insert all-gathers/reduce-scatters. ``fsdp_sharding`` is the ZeRO-3
analog of the reference's ``transformer_auto_wrap_policy`` + FSDP;
``tp_sharding`` adds Megatron-style tensor parallelism over the ``tp`` mesh
axis via logical-axis rules on parameter paths (the reference has no TP —
this is a TPU-first capability, SURVEY §2.8).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_sharding(
    params: Any,
    mesh: Mesh,
    axis: str = "fsdp",
    min_weight_size: int = 2 ** 12,
) -> Any:
    """Shard each parameter leaf's largest divisible dim over ``axis``.

    Small leaves (biases, norms, scalars) stay replicated — sharding them
    costs more in collective latency than it saves in memory.
    """
    return jax.tree_util.tree_map(
        lambda leaf: _fsdp_rule(leaf, mesh, axis, min_weight_size), params
    )


# Megatron-style logical-axis rules: (path regex, spec over (in, out) dims).
# Column-parallel weights (QKV / first MLP matmul) shard the OUTPUT dim over
# tp; row-parallel weights (attention output / second MLP matmul) shard the
# INPUT dim, so the pair needs exactly one psum per block and activations
# stay tp-sharded between them. fsdp rides the other dim (ZeRO-3 on top).
# Kernel layout is Flax (in, out).
_COLUMN_PARALLEL = (
    r"(in_proj|input_proj|q_proj|k_proj|v_proj|query|key|value"
    r"|linear1|hidden_\d+|fc1|wi|w1|w3|gate_proj|up_proj)"
)
_ROW_PARALLEL = r"(out_proj|output_proj|linear2|out|fc2|wo|w2|down_proj|dense_out)"

DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # MoE expert weights (MoEFeedForward): expert dim over ep, then the
    # usual Megatron column/row split over tp within each expert. The
    # router stays replicated so routing decisions agree everywhere.
    (r"feedforward/wi$", P("ep", "fsdp", "tp")),
    (r"feedforward/wo$", P("ep", "tp", "fsdp")),
    (r"feedforward/bi$", P("ep", "tp")),
    (r"feedforward/bo$", P("ep")),
    (r"router/kernel$", P(None, None)),
    # scan-layout encoders (TransformerEncoder(scan_layers=True)) stack a
    # leading (n_layer,) dim on every block param; keep the Megatron split
    # on the matmul dims and leave the layer dim unsharded (fsdp/tp placement
    # is per-layer identical, so GSPMD treats the stack as n_layer slices).
    (rf"layers/layer/.*{_COLUMN_PARALLEL}/kernel$", P(None, "fsdp", "tp")),
    (rf"layers/layer/.*{_ROW_PARALLEL}/kernel$", P(None, "tp", "fsdp")),
    (rf"layers/layer/.*{_COLUMN_PARALLEL}/bias$", P(None, "tp")),
    (rf"{_COLUMN_PARALLEL}/kernel$", P("fsdp", "tp")),
    (rf"{_ROW_PARALLEL}/kernel$", P("tp", "fsdp")),
    # column-parallel biases live on the tp-sharded output dim;
    # row-parallel biases are added after the psum -> replicated.
    (rf"{_COLUMN_PARALLEL}/bias$", P("tp")),
    # embedding tables: shard the embedding dim over fsdp only (vocab-parallel
    # embeddings need a masked-lookup + psum pattern; not worth it here).
    (r"embedding$", P(None, "fsdp")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_fits(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> Optional[P]:
    """Drop axes that are absent/size-1 in the mesh or don't divide the dim;
    return None if the spec has more entries than the tensor has dims."""
    if len(spec) > len(shape):
        return None
    out = []
    for i, entry in enumerate(spec):
        if entry is None:
            out.append(None)
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        kept = tuple(
            n for n in names
            if n in mesh.shape and mesh.shape[n] > 1
        )
        size = int(np.prod([mesh.shape[n] for n in kept])) if kept else 1
        if not kept or shape[i] % size != 0:
            out.append(None)
        elif len(kept) == 1:
            out.append(kept[0])
        else:
            out.append(kept)
    return P(*out)


def tp_sharding(
    params: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
    min_weight_size: int = 2 ** 12,
) -> Any:
    """FSDP + tensor-parallel shardings from logical-axis rules.

    Walks the param tree with paths; the first rule whose regex matches the
    ``/``-joined path decides the PartitionSpec (axes that don't fit the
    tensor/mesh are dropped per-dim). Unmatched leaves fall back to the
    ``fsdp_sharding`` shape heuristic, so norms/biases stay replicated.
    """
    def rule(path, leaf):
        name = _path_str(path)
        if np.prod(leaf.shape) >= min_weight_size:
            for pattern, spec in rules:
                if re.search(pattern, name):
                    fitted = _spec_fits(spec, leaf.shape, mesh)
                    if fitted is not None:
                        return NamedSharding(mesh, fitted)
        # fallback: fsdp-only shape heuristic (same as fsdp_sharding)
        return _fsdp_rule(leaf, mesh, "fsdp", min_weight_size)

    return jax.tree_util.tree_map_with_path(rule, params)


def _fsdp_rule(leaf, mesh: Mesh, axis: str, min_weight_size: int) -> NamedSharding:
    axis_size = mesh.shape.get(axis, 1)
    if axis_size == 1 or np.prod(leaf.shape) < min_weight_size:
        return NamedSharding(mesh, P())
    best = None
    for i, d in enumerate(leaf.shape):
        if d % axis_size == 0 and (best is None or d > leaf.shape[best]):
            best = i
    if best is None:
        return NamedSharding(mesh, P())
    spec = [None] * leaf.ndim
    spec[best] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)


def batch_sharding(mesh: Mesh, batch_axes=("dcn", "dp", "fsdp")) -> NamedSharding:
    """Shard the leading (batch) dim over the data axes jointly."""
    axes = tuple(a for a in batch_axes if a in mesh.shape and mesh.shape[a] > 1)
    if not axes:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axes))


def shard_params(params: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
