"""Generic VQ-VAE: encoder + EMA codebook + decoder.

Parity with reference ``models/vqvae.py`` (VQVAE:26, VQVAEOutput,
encode:72, decode:93, lookup, latent_shape). Channel-LAST layout
``(b, d1..dn, c)`` throughout — the encoder output feeds the codebook with
no transpose (the reference's ``shift_dim`` shuffles disappear).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.codebook import Codebook, CodebookOutput


class VQVAEOutput(NamedTuple):
    decoded: jnp.ndarray
    codebook_output: CodebookOutput


class VQVAE(nn.Module):
    encoder: nn.Module
    decoder: nn.Module
    num_embeddings: int
    embedding_dim: int

    def setup(self):
        self.codebook = Codebook(self.num_embeddings, self.embedding_dim)

    def latent_shape(self, input_shape: Tuple[int, ...]) -> Tuple[int, ...]:
        """Downsampled shape of the encoder output: (d1, ..., dn)."""
        if not hasattr(self.encoder, "get_latent_shape"):
            raise AttributeError(
                f"Missing attribute 'get_latent_shape' of the encoder {self.encoder}"
            )
        return self.encoder.get_latent_shape(input_shape)

    def encode(
        self, x: jnp.ndarray, return_embeddings: bool = False, deterministic: bool = True
    ):
        """Data -> token ids ``(b, d1..dn)`` (optionally also quantized embeddings)."""
        encoded = self.encoder(x, deterministic=deterministic)
        out = self.codebook(encoded, deterministic=True)
        if return_embeddings:
            return out.codebook_indices, out.quantized
        return out.codebook_indices

    def decode(self, indices: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Token ids ``(b, d1..dn)`` -> data."""
        quantized = self.lookup(indices)  # (b, d1..dn, emb_dim) channel-last
        return self.decoder(quantized, deterministic=deterministic)

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.codebook.lookup(indices)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> VQVAEOutput:
        encoded = self.encoder(x, deterministic=deterministic)
        codebook_output = self.codebook(encoded, deterministic=deterministic)
        decoded = self.decoder(codebook_output.quantized, deterministic=deterministic)
        return VQVAEOutput(decoded, codebook_output)
