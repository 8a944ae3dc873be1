"""Multi-LoRA serving: many adapters batched over one frozen base model.

Production pattern (beyond the reference, which has no serving layer at
all): one deployed base model serves requests for N fine-tuned variants by
keeping the LoRA factors of every adapter resident and selecting per
request. Folding (``training/lora.py:lora_fold``) supports exactly one
adapter per engine; this module makes the adapter a PER-SLOT property of
the continuous batch, so requests for different adapters decode in the
same lockstep tick.

TPU-native design:

  - All adapters stack into ONE pytree shaped like the base params, with
    ``LoRAFactor(a: (N, in, r), b: (N, r, out))`` leaves at adapted
    kernels (``stack_adapters``). Index 0 is the implicit base model
    (zero factors), so "no adapter" needs no branch.
  - A per-slot ``adapter_ids (batch,)`` vector gathers each row's factors
    at apply time. The adapted matmul is computed factored —
    ``y = x @ W + ((x @ a[id]) @ b[id]) * alpha/r`` — never materializing
    per-row dense deltas: two rank-r einsums per adapted kernel whose
    gather traffic is ``batch * (in + out) * r`` elements, negligible next
    to the shared ``x @ W``.
  - No model surgery: adapted kernels are intercepted at the flax module
    boundary (``nn.intercept_methods``). Any model in this library gains
    multi-adapter serving without a code change — the interceptor matches
    each ``nn.Dense``'s variable path against the stacked tree, exactly
    the paths ``training/lora.py:lora_init`` adapted.

Used by ``serving.InferenceEngine(adapters={...})``; requests select with
``Request(adapter="name")``. Batched-vs-folded equivalence is asserted in
``tests/serving/test_multi_lora.py``.
"""

from __future__ import annotations

import contextlib
from typing import Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_tpu.training.lora import LoRAFactor


def _tree_paths(tree, path=()):
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _tree_paths(v, path + (k,))
    else:
        yield path, tree


def stack_adapters(adapters: Sequence, include_base: bool = True):
    """Stack structurally-identical LoRA trees (``training/lora.py``
    layout: ``LoRAFactor`` at adapted kernels, ``None`` elsewhere) into one
    tree with a leading adapter axis on every factor.

    With ``include_base`` (default), index 0 is an all-zero adapter (the
    base model) and real adapters live at ``1..N``.
    """
    if not adapters:
        raise ValueError("no adapters given")
    ref = [p for p, leaf in _tree_paths(adapters[0])]
    for i, other in enumerate(adapters[1:], 1):
        if [p for p, _ in _tree_paths(other)] != ref:
            raise ValueError(
                f"adapter {i} has a different structure than adapter 0 "
                "(all adapters must come from the same lora_init targets)"
            )

    def stack(*leaves):
        if leaves[0] is None:
            if any(l is not None for l in leaves):
                raise ValueError("adapters disagree on which kernels adapt")
            return None
        if any(
            l.a.shape != leaves[0].a.shape or l.alpha != leaves[0].alpha
            for l in leaves
        ):
            raise ValueError("adapters disagree on rank/shape/alpha")
        a = jnp.stack([l.a for l in leaves])
        b = jnp.stack([l.b for l in leaves])
        if include_base:
            a = jnp.concatenate([jnp.zeros_like(a[:1]), a])
            b = jnp.concatenate([jnp.zeros_like(b[:1]), b])
        return LoRAFactor(a=a, b=b, alpha=leaves[0].alpha)

    def walk(*nodes):
        if isinstance(nodes[0], Mapping):
            return {k: walk(*(n[k] for n in nodes)) for k in nodes[0]}
        return stack(*nodes)

    return walk(*adapters)


def _lookup(tree, path):
    node = tree
    for name in path:
        if not isinstance(node, Mapping) or name not in node:
            return None
        node = node[name]
    return node


@contextlib.contextmanager
def multi_lora_scope(stacked, adapter_ids: jnp.ndarray, strict: bool = True):
    """Within this scope, every ``nn.Dense`` whose kernel is adapted in
    ``stacked`` adds its per-row LoRA update, selected by ``adapter_ids``
    (one id per leading-axis row). Use INSIDE jit, around ``model.apply``;
    both ``stacked`` and ``adapter_ids`` trace as ordinary arguments.

    With ``strict`` (default), the scope raises on exit if any adapted
    kernel in ``stacked`` was never applied — e.g. a kernel whose consumer
    is not an ``nn.Dense``, or a Dense whose input's leading dim is not the
    request batch. Without the check such factors would silently serve
    base-model weights; narrow the ``lora_init`` ``targets`` to kernels the
    interceptor can reach instead.
    """
    if stacked is None:
        yield
        return
    n_rows = adapter_ids.shape[0]
    expected = {
        "/".join(p)
        for p, leaf in _tree_paths(stacked)
        if isinstance(leaf, LoRAFactor)
    }
    consumed: set = set()

    def interceptor(next_fun, args, kwargs, context):
        if (
            not isinstance(context.module, nn.Dense)
            or context.method_name != "__call__"
        ):
            return next_fun(*args, **kwargs)
        path = ("params",) + context.module.path + ("kernel",)
        factor = _lookup(stacked, path)
        if factor is None:
            path = context.module.path + ("kernel",)
            factor = _lookup(stacked, path)
        y = next_fun(*args, **kwargs)
        if not isinstance(factor, LoRAFactor):
            return y
        x = args[0]
        if x.ndim < 2 or x.shape[0] != n_rows:
            return y
        consumed.add("/".join(path))
        rank = factor.a.shape[-1]
        a = factor.a[adapter_ids].astype(x.dtype)  # (rows, in, r)
        b = factor.b[adapter_ids].astype(x.dtype)  # (rows, r, out)
        delta = jnp.einsum("b...i,bir->b...r", x, a)
        delta = jnp.einsum("b...r,bro->b...o", delta, b)
        return y + (delta * (factor.alpha / rank)).astype(y.dtype)

    from multimodal_tpu.modules.layers.dense_params import dense_interception

    # dense_interception makes DenseParams/fused-kernel fast paths (MLP,
    # CLIP feedforward) fall back to module-boundary nn.Dense calls so the
    # interceptor sees every adapted matmul
    with nn.intercept_methods(interceptor), dense_interception():
        yield
    if strict and consumed != expected:
        missing = sorted(expected - consumed)
        raise ValueError(
            "multi-LoRA adapters for these kernels were never applied "
            f"(unreachable from nn.Dense with a request-batch leading dim): "
            f"{missing[:8]}{' ...' if len(missing) > 8 else ''} — narrow "
            "lora_init(targets=...) to adaptable kernels"
        )


def build_adapter_table(adapters: Optional[Mapping[str, object]]):
    """Engine-side helper: name -> id map (0 reserved for the base model)
    plus the stacked factor tree; ``(None, None)`` when serving base-only."""
    if not adapters:
        return None, None
    names = list(adapters)
    table = {name: i + 1 for i, name in enumerate(names)}
    stacked = stack_adapters([adapters[n] for n in names], include_base=True)
    return table, stacked
