"""Retrieval Recall@k tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.training.retrieval_eval import retrieval_recall_at_k


def _embs(n=20, d=8, noise=0.0, seed=0):
    r = np.random.RandomState(seed)
    base = r.randn(n, d).astype(np.float32)
    return base, base + noise * r.randn(n, d).astype(np.float32)


def test_perfect_retrieval():
    a, b = _embs(noise=0.0)
    out = retrieval_recall_at_k(jnp.asarray(a), jnp.asarray(b), ks=(1, 5))
    assert out["a2b_recall_1"] == 1.0 and out["b2a_recall_5"] == 1.0


def test_recall_matches_numpy_ranking():
    r = np.random.RandomState(1)
    a = r.randn(30, 8).astype(np.float32)
    b = r.randn(30, 8).astype(np.float32)
    out = retrieval_recall_at_k(jnp.asarray(a), jnp.asarray(b), ks=(1, 5, 10))

    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    sim = an @ bn.T
    for k in (1, 5, 10):
        want = np.mean([
            np.sum(sim[i] > sim[i, i]) < k for i in range(30)
        ])
        assert abs(out[f"a2b_recall_{k}"] - want) < 1e-6


def test_chunked_equals_full():
    r = np.random.RandomState(2)
    a = r.randn(25, 8).astype(np.float32)
    b = r.randn(25, 8).astype(np.float32)
    full = retrieval_recall_at_k(jnp.asarray(a), jnp.asarray(b))
    chunked = retrieval_recall_at_k(jnp.asarray(a), jnp.asarray(b), chunk_size=7)
    for key in full:
        assert abs(full[key] - chunked[key]) < 1e-6
