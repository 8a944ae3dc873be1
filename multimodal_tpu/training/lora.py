"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

Capability beyond the reference (which fine-tunes full models only —
e.g. ALBEF retrieval/VQA train every parameter). LoRA freezes the base
weights and learns a rank-``r`` update ``w + (alpha / r) * a @ b`` per
matmul kernel, cutting trainable state (and optimizer memory, 2x Adam
moments) by orders of magnitude — the production path for adapting the
big towers (CLIP/FLAVA/BERT/ViT) to a task, and for serving many adapters
over one frozen base.

Functional pytree design (mirrors ``quantization/weight_only.py``): LoRA
factors live in their OWN pytree, shaped like the param tree but with
``LoRAFactor(a, b)`` leaves at adapted kernels and ``None`` elsewhere.
``lora_merge(base, lora)`` runs INSIDE the jitted step, so the base tree
stays frozen and donated-free while only factor leaves receive gradients:

    lora = lora_init(rng, params, rank=8)
    def loss_fn(lora, batch):
        return task_loss(model.apply(lora_merge(params, lora), batch))
    grads = jax.grad(loss_fn)(lora, batch)   # grads only for a/b

Merging materializes ``a @ b`` (an (in, out) outer product) per adapted
kernel per step; XLA fuses it with the add, and for the transformer
kernels this costs one rank-r matmul — negligible next to the forward.
For serving, ``lora_fold`` bakes the update into a plain param tree once.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class LoRAFactor:
    a: jnp.ndarray  # (in, rank) — gaussian init
    b: jnp.ndarray  # (rank, out) — zero init, so the initial update is 0
    alpha: float = flax.struct.field(pytree_node=False, default=1.0)

    def delta(self) -> jnp.ndarray:
        scale = self.alpha / self.a.shape[-1]
        return (self.a @ self.b) * scale


def _is_adaptable(path: str, leaf, min_size: int, targets) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim != 2:
        return False
    if leaf.size < min_size:
        return False
    name = path.split("/")[-1]
    if name != "kernel":
        return False
    if targets is None:
        return True
    return any(t in path for t in targets)


def lora_init(
    rng: jax.Array,
    params,
    rank: int = 8,
    alpha: Optional[float] = None,
    targets: Optional[Sequence[str]] = None,
    min_size: int = 4096,
    dtype=jnp.float32,
):
    """Build a LoRA tree over every 2-D ``kernel`` leaf (optionally filtered
    by ``targets`` path substrings, e.g. ``("q_proj", "v_proj")``).
    ``b`` starts at zero: the adapted model initially equals the base."""
    alpha = float(alpha if alpha is not None else rank)
    leaves = []

    def mark(node, path=""):
        if isinstance(node, Mapping):
            return {k: mark(v, f"{path}/{k}") for k, v in node.items()}
        if _is_adaptable(path, node, min_size, targets):
            leaves.append((path, node.shape))
            return ("__lora__", node.shape)
        return None

    skeleton = mark(params)
    keys = jax.random.split(rng, max(len(leaves), 1))
    key_iter = iter(keys)

    def build(node):
        if isinstance(node, dict):
            return {k: build(v) for k, v in node.items()}
        if isinstance(node, tuple) and node and node[0] == "__lora__":
            d_in, d_out = node[1]
            k = next(key_iter)
            return LoRAFactor(
                a=jax.random.normal(k, (d_in, rank), dtype) / jnp.sqrt(d_in),
                b=jnp.zeros((rank, d_out), dtype),
                alpha=alpha,
            )
        return None

    return build(skeleton)


def lora_merge(base, lora):
    """``base`` with every adapted kernel replaced by
    ``w + (alpha / rank) * a @ b``. Call inside jit; gradients w.r.t.
    ``lora`` flow through the factors only."""

    def walk(b, l):
        if isinstance(l, LoRAFactor):
            return (b + l.delta()).astype(b.dtype)
        if isinstance(b, Mapping):
            return {k: walk(b[k], None if l is None else l[k]) for k in b}
        return b

    return walk(base, lora)


def lora_fold(base, lora):
    """Materialize the adapted weights once (serving: hand the folded tree
    to the engine / EmbeddingServer; zero runtime overhead thereafter)."""
    return jax.jit(lora_merge)(base, lora)


def lora_param_count(lora) -> int:
    return sum(
        x.size
        for x in jax.tree_util.tree_leaves(lora)
        if hasattr(x, "size")
    )
