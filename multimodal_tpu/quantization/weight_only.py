"""Weight-only int8 post-training quantization.

Serving-path capability beyond the reference (which has no quantization
surface at all): halve (vs bf16) or quarter (vs fp32) the HBM footprint and
weight-read traffic of any model in the library — the binding resource for
small-batch inference and autoregressive decode on TPU, where step time
tracks bytes read, not FLOPs (see BENCHMARKS.md, decode section).

Design: per-output-channel symmetric int8. Each matmul-shaped parameter
leaf ``w`` becomes a ``QuantizedLeaf(q, scale)`` with
``scale = max|w| / 127`` reduced over all input axes, so
``w ~= q * scale`` channel by channel. ``QuantizedLeaf`` is a registered
pytree (the original dtype rides as static metadata), so quantized trees
checkpoint, shard, donate, and jit like ordinary params. Dequantization
happens INSIDE the jitted consumer (``QuantizedModule.apply`` /
``dequantize_tree``): weights live in HBM as int8 and XLA fuses the
upcast-and-scale into the consumer's operand read. Compute stays bf16 on
the MXU — a memory-format optimization, not reduced-precision arithmetic,
keeping accuracy loss to the rounding of the weights themselves
(cosine >= 0.999 on CLIP towers, see ``tests/quantization/``).
"""

from __future__ import annotations

from typing import Callable, Mapping

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class QuantizedLeaf:
    q: jnp.ndarray  # int8 values
    scale: jnp.ndarray  # fp32 per-output-channel scales
    dtype: str = flax.struct.field(pytree_node=False, default="float32")


def _is_quantizable(path: str, leaf, min_size: int) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return False
    if leaf.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return False
    if leaf.size < min_size:
        return False
    # kernels and embedding tables; leave norms/biases/scales alone
    name = path.split("/")[-1]
    return name in ("kernel", "embedding")


def _quantize_leaf(w: jnp.ndarray) -> QuantizedLeaf:
    # reduce over every axis but the last (output channels / embed dim)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return QuantizedLeaf(
        q=q, scale=scale.astype(jnp.float32), dtype=jnp.dtype(w.dtype).name
    )


def _dequantize_leaf(node: QuantizedLeaf) -> jnp.ndarray:
    return (
        node.q.astype(jnp.float32) * node.scale
    ).astype(jnp.dtype(node.dtype))


def quantize_tree(params, min_size: int = 4096):
    """Quantize every matmul-shaped leaf (kernels + embedding tables with
    ``size >= min_size``) of a param tree to per-channel int8. Returns a
    pytree of the same structure with those leaves replaced by
    ``QuantizedLeaf`` nodes."""

    def walk(node, path=""):
        if isinstance(node, Mapping):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if _is_quantizable(path, node, min_size):
            return _quantize_leaf(node)
        return node

    return walk(params)


def dequantize_tree(qparams):
    """Rebuild a dense param tree (call inside jit: the upcast fuses into
    each consumer)."""

    def walk(node):
        if isinstance(node, QuantizedLeaf):
            return _dequantize_leaf(node)
        if isinstance(node, Mapping):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(qparams)


def quantization_error(params, qparams) -> dict:
    """Per-leaf relative L2 error of the quantization (diagnostic)."""
    errs = {}

    def walk(p, q, path=""):
        if isinstance(q, QuantizedLeaf):
            w = p.astype(jnp.float32)
            err = jnp.linalg.norm(w - _dequantize_leaf(q).astype(jnp.float32))
            errs[path] = float(err / (jnp.linalg.norm(w) + 1e-12))
        elif isinstance(q, Mapping):
            for k in q:
                walk(p[k], q[k], f"{path}/{k}")

    walk(params, qparams)
    return errs


class QuantizedModule:
    """Duck-typed stand-in for a flax module whose ``apply`` takes a
    quantized tree: dequantizes inside the traced function and forwards
    everything else (``n_layer``, ``d_model``, ...) to the wrapped module —
    drop-in for the serving engine:

        qparams = quantize_tree(params)
        engine = InferenceEngine(QuantizedModule(model), qparams, ...)
    """

    def __init__(self, module, dequantize: Callable = dequantize_tree):
        self._module = module
        self._dequantize = dequantize

    def apply(self, qparams, *args, **kwargs):
        return self._module.apply(self._dequantize(qparams), *args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._module, name)


def size_bytes(tree) -> int:
    """Total array bytes of a (possibly quantized) pytree."""
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )
