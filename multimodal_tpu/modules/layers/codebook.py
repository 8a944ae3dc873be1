"""EMA vector-quantization codebook (VQ-VAE bottleneck).

Parity with reference ``modules/layers/codebook.py:31`` (Codebook):
nearest-neighbor lookup, straight-through estimator, EMA embedding updates
with Laplace smoothing, dead-code re-init below a usage threshold, and lazy
initialization from the first encoder batch.

TPU-native state design: the reference mutates registered buffers inside
``forward`` — here all of that is an explicit Flax variable collection
(``vq_stats``) updated functionally; training steps apply the module with
``mutable=["vq_stats"]`` and thread the new state. Distances are computed as
``|e|² - 2·z·eᵀ + |z|²`` so the dominant term is one MXU matmul instead of a
memory-bound cdist. Layout is channel-last ``(b, d1..dn, c)``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class CodebookOutput(NamedTuple):
    encoded_flat: jnp.ndarray
    quantized_flat: jnp.ndarray
    codebook_indices: jnp.ndarray
    quantized: jnp.ndarray


def _tile_to(rng: jax.Array, x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Repeat rows of x (with small noise) until there are >= n rows."""
    num_vectors, num_channels = x.shape
    if num_vectors < n:
        num_repeats = (n + num_vectors - 1) // num_vectors
        std = 0.01 / (num_channels ** 0.5)
        x = jnp.tile(x, (num_repeats, 1))
        x = x + jax.random.normal(rng, x.shape, x.dtype) * std
    return x


def _random_vectors(rng: jax.Array, x: jnp.ndarray, n: int) -> jnp.ndarray:
    rng_tile, rng_perm = jax.random.split(rng)
    x_tiled = _tile_to(rng_tile, x, n)
    idx = jax.random.permutation(rng_perm, x_tiled.shape[0])
    return x_tiled[idx[:n]]


class Codebook(nn.Module):
    num_embeddings: int
    embedding_dim: int
    decay: float = 0.99
    codebook_usage_threshold: float = 1.0
    epsilon: float = 1e-7
    param_dtype: Any = jnp.float32

    def setup(self):
        init_emb = lambda: jax.random.normal(
            self.make_rng("params") if self.has_rng("params") else jax.random.key(0),
            (self.num_embeddings, self.embedding_dim), self.param_dtype,
        )
        self.embedding_var = self.variable("vq_stats", "embedding", init_emb)
        self.code_usage_var = self.variable(
            "vq_stats", "code_usage", lambda: jnp.zeros((self.num_embeddings,), self.param_dtype)
        )
        self.code_avg_var = self.variable("vq_stats", "code_avg", lambda: self.embedding_var.value)
        self.is_init_var = self.variable("vq_stats", "is_init", lambda: jnp.array(False))

    @property
    def embedding(self) -> jnp.ndarray:
        return self.embedding_var.value

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Embeddings of shape ``indices.shape + (embedding_dim,)``."""
        return jnp.take(self.embedding_var.value, indices, axis=0)

    def _quantize_indices(self, encoded_flat: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
        # ||z - e||^2 = |z|^2 - 2 z.e + |e|^2 ; |z|^2 constant across argmin.
        dots = jnp.dot(
            encoded_flat, embedding.T, preferred_element_type=jnp.float32
        )
        e_sq = jnp.sum(jnp.square(embedding.astype(jnp.float32)), axis=-1)
        return jnp.argmin(e_sq[None, :] - 2.0 * dots, axis=1)

    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> CodebookOutput:
        """z: encoder output of shape ``(b, d1, ..., dn, c)`` (channel-last)."""
        orig_shape = z.shape
        if orig_shape[-1] != self.embedding_dim:
            raise ValueError(
                f"Expected last dim {orig_shape[-1]} to equal embedding size {self.embedding_dim}"
            )
        encoded_flat = z.reshape(-1, self.embedding_dim)

        train = not deterministic
        embedding = self.embedding_var.value
        code_usage = self.code_usage_var.value
        code_avg = self.code_avg_var.value
        is_init = self.is_init_var.value

        if train:
            rng = self.make_rng("vq")
            rng_init, rng_reset = jax.random.split(rng)
            # Lazy init from first encoder batch (reference codebook.py:156-169),
            # jit-safe via select on the is_init flag.
            rand_init = _random_vectors(rng_init, encoded_flat.astype(self.param_dtype), self.num_embeddings)
            embedding = jnp.where(is_init, embedding, rand_init)
            code_avg = jnp.where(is_init, code_avg, rand_init)
            code_usage = jnp.where(is_init, code_usage, jnp.ones_like(code_usage))

        indices = self._quantize_indices(encoded_flat, embedding)
        # quantized output uses the PRE-update embedding — the reference looks
        # codes up before its in-place EMA update (codebook.py:217-222)
        lookup_embedding = embedding

        if train:
            # EMA update (reference codebook.py:171-207).
            onehot = jax.nn.one_hot(indices, self.num_embeddings, dtype=jnp.float32)
            selection_count = jnp.sum(onehot, axis=0)
            code_usage = code_usage * self.decay + selection_count * (1 - self.decay)
            n = jnp.sum(code_usage)
            code_usage = (
                (code_usage + self.epsilon)
                / (n + self.num_embeddings * self.epsilon)
                * n
            )
            encoded_per_code = jnp.dot(
                onehot.T, encoded_flat.astype(jnp.float32), preferred_element_type=jnp.float32
            ).astype(self.param_dtype)
            code_avg = code_avg * self.decay + encoded_per_code * (1 - self.decay)
            embedding = code_avg / code_usage[:, None]
            # Dead-code re-init below usage threshold (reference :202-207).
            rand_reset = _random_vectors(
                rng_reset, encoded_flat.astype(self.param_dtype), self.num_embeddings
            )
            embedding = jnp.where(
                code_usage[:, None] >= self.codebook_usage_threshold, embedding, rand_reset
            )
            if not self.is_initializing():
                self.embedding_var.value = embedding
                self.code_usage_var.value = code_usage
                self.code_avg_var.value = code_avg
                self.is_init_var.value = jnp.array(True)

        quantized_flat = jnp.take(lookup_embedding, indices, axis=0).astype(z.dtype)
        # Straight-through estimator.
        quantized_flat = encoded_flat + jax.lax.stop_gradient(quantized_flat - encoded_flat)
        quantized = quantized_flat.reshape(orig_shape)
        codebook_indices = indices.reshape(orig_shape[:-1])
        return CodebookOutput(encoded_flat, quantized_flat, codebook_indices, quantized)
