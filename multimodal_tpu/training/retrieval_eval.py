"""Cross-modal retrieval evaluation: Recall@k over an embedding similarity
matrix.

TPU-native analog of the reference's retrieval eval protocols — the MUGEN
VideoCLIP Lightning module's `_compute_recall`
(``examples/mugen/retrieval/model.py:73-87``: similarity matrix + identity
targets + Recall@k both directions) and the diagonal-target convention
shared by the FLAVA/ALBEF retrieval evals. The whole metric (similarity,
top-k membership, both directions, all ks) is ONE jitted computation.

For large galleries that don't fit a single (n, n) matrix in HBM, pass
``chunk_size`` to stream the query axis.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("ks",))
def _recall_from_similarity(
    sim: jnp.ndarray,             # (nq, ng) similarity, target = diagonal
    ks: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    nq = sim.shape[0]
    target = jnp.arange(nq)
    # rank of the target within each row = number of strictly larger scores
    target_score = jnp.take_along_axis(sim, target[:, None], axis=1)
    rank = jnp.sum(sim > target_score, axis=1)
    return {int(k): jnp.mean(rank < k) for k in ks}


def retrieval_recall_at_k(
    embeddings_a: jnp.ndarray,
    embeddings_b: jnp.ndarray,
    ks: Sequence[int] = (1, 5, 10),
    normalize: bool = True,
    chunk_size: Optional[int] = None,
) -> Dict[str, float]:
    """Recall@k for a<->b retrieval with diagonal ground truth.

    Returns ``{"a2b_recall_{k}", "b2a_recall_{k}"}`` — a2b uses rows of
    ``a @ b.T`` (query = a), b2a the transpose, matching the reference's
    t2v/v2t pair.
    """
    if embeddings_a.shape[0] != embeddings_b.shape[0]:
        raise ValueError("paired retrieval eval needs equal counts")
    a = jnp.asarray(embeddings_a, jnp.float32)
    b = jnp.asarray(embeddings_b, jnp.float32)
    if normalize:
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    ks = tuple(int(k) for k in ks)

    def direction(q, g):
        if chunk_size is None:
            return _recall_from_similarity(q @ g.T, ks)
        n = q.shape[0]
        hits = {k: 0.0 for k in ks}
        for start in range(0, n, chunk_size):
            qc = q[start:start + chunk_size]
            sim = qc @ g.T
            target = jnp.arange(start, start + qc.shape[0])
            target_score = jnp.take_along_axis(sim, target[:, None], axis=1)
            rank = jnp.sum(sim > target_score, axis=1)
            for k in ks:
                hits[k] += float(jnp.sum(rank < k))
        return {k: hits[k] / n for k in ks}

    a2b = direction(a, b)
    b2a = direction(b, a)
    out: Dict[str, float] = {}
    for k in ks:
        out[f"a2b_recall_{k}"] = float(a2b[k])
        out[f"b2a_recall_{k}"] = float(b2a[k])
    return out
