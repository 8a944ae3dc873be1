"""LDM variational autoencoder.

Parity with reference ``diffusion_labs/models/vae/`` (res blocks, attention,
up/down sampling, ``VariationalAutoencoder`` with diagonal-Gaussian
posterior, vae.py:24-76). NHWC layout.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class GaussianPosterior(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def kl(self) -> jnp.ndarray:
        logvar = jnp.clip(self.logvar, -30.0, 20.0)
        return 0.5 * jnp.sum(
            self.mean ** 2 + jnp.exp(logvar) - 1.0 - logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gn = lambda name, c: nn.GroupNorm(
            num_groups=32 if c % 32 == 0 else 8, epsilon=1e-6,
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name,
        )
        h = jax.nn.silu(gn("norm1", x.shape[-1])(x.astype(jnp.float32)).astype(x.dtype))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        h = jax.nn.silu(gn("norm2", self.out_channels)(h.astype(jnp.float32)).astype(h.dtype))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="skip")(x)
        return x + h


class VAEAttention(nn.Module):
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        t = nn.GroupNorm(
            num_groups=32 if c % 32 == 0 else 8, epsilon=1e-6,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="norm",
        )(x.astype(jnp.float32)).astype(x.dtype).reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        q, k, v = dense("q")(t), dense("k")(t), dense("v")(t)
        attn = jax.nn.softmax(q @ k.swapaxes(-2, -1) / jnp.sqrt(c), axis=-1)
        out = dense("proj")(attn @ v)
        return x + out.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    channels: Sequence[int] = (128, 256, 512, 512)
    n_res: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(self.channels[0], (3, 3), padding=1, name="conv_in", **common)(x)
        for li, ch in enumerate(self.channels):
            for bi in range(self.n_res):
                h = VAEResBlock(ch, name=f"down_{li}_{bi}", **common)(h)
            if li < len(self.channels) - 1:
                # LDM downsample: asymmetric zero-pad (0,1,0,1) then a
                # stride-2 VALID conv (reference residual_sampling.py:35-68)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"downsample_{li}", **common)(h)
        h = VAEResBlock(self.channels[-1], name="mid_res1", **common)(h)
        h = VAEAttention(name="mid_attn", **common)(h)
        h = VAEResBlock(self.channels[-1], name="mid_res2", **common)(h)
        h = nn.GroupNorm(num_groups=32 if h.shape[-1] % 32 == 0 else 8, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm_out")(h.astype(jnp.float32)).astype(h.dtype)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       name="conv_out", **common)(jax.nn.silu(h))


class VAEDecoder(nn.Module):
    channels: Sequence[int] = (512, 512, 256, 128)
    n_res: int = 2
    out_channels: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(self.channels[0], (3, 3), padding=1, name="conv_in", **common)(z)
        h = VAEResBlock(self.channels[0], name="mid_res1", **common)(h)
        h = VAEAttention(name="mid_attn", **common)(h)
        h = VAEResBlock(self.channels[0], name="mid_res2", **common)(h)
        for li, ch in enumerate(self.channels):
            for bi in range(self.n_res):
                h = VAEResBlock(ch, name=f"up_{li}_{bi}", **common)(h)
            if li < len(self.channels) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, name=f"upsample_{li}", **common)(h)
        h = nn.GroupNorm(num_groups=32 if h.shape[-1] % 32 == 0 else 8, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm_out")(h.astype(jnp.float32)).astype(h.dtype)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       name="conv_out", **common)(jax.nn.silu(h))


class VariationalAutoencoder(nn.Module):
    """Encoder -> diagonal-Gaussian posterior -> decoder (reference vae.py:24).

    When ``embedding_channels`` is set, a 1x1 ``quant_conv`` maps the encoder
    moments to the embedding space and ``post_quant_conv`` maps back before
    decoding — matching the reference's LDM builder (vae.py:91-116)."""

    encoder: nn.Module
    decoder: nn.Module
    latent_channels: int = 4
    embedding_channels: Optional[int] = None
    rng_collection: str = "vae"

    def setup(self):
        if self.embedding_channels is not None:
            self.quant_conv = nn.Conv(
                2 * self.embedding_channels, (1, 1), name="quant_conv"
            )
            self.post_quant_conv = nn.Conv(
                self.latent_channels, (1, 1), name="post_quant_conv"
            )

    def encode(self, x: jnp.ndarray) -> GaussianPosterior:
        moments = self.encoder(x)
        if self.embedding_channels is not None:
            moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return GaussianPosterior(mean, logvar)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.embedding_channels is not None:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(
        self, x: jnp.ndarray, sample_posterior: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, GaussianPosterior]:
        posterior = self.encode(x)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng(self.rng_collection)
            z = posterior.sample(rng)
        else:
            z = posterior.mean
        return self.decode(z), posterior


def variational_autoencoder(
    channels: Sequence[int] = (128, 256, 512, 512),
    n_res: int = 2,
    latent_channels: int = 4,
    out_channels: int = 3,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> VariationalAutoencoder:
    return VariationalAutoencoder(
        encoder=VAEEncoder(channels, n_res, latent_channels, dtype, param_dtype),
        decoder=VAEDecoder(tuple(reversed(channels)), n_res, out_channels, dtype, param_dtype),
        latent_channels=latent_channels,
    )


def ldm_variational_autoencoder(
    *,
    embedding_channels: int,
    out_channels: int = 3,
    z_channels: int = 4,
    channels: int = 128,
    num_res_blocks: int = 2,
    channel_multipliers: Sequence[int] = (1, 2, 4, 8),
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> VariationalAutoencoder:
    """LDM autoencoder with the reference's config surface (vae.py:76-142):
    encoder channels = channels * multipliers, quant/post-quant 1x1 convs,
    and the decoder running ``num_res_blocks + 1`` blocks per level."""
    enc_channels = tuple(channels * m for m in channel_multipliers)
    return VariationalAutoencoder(
        encoder=VAEEncoder(enc_channels, num_res_blocks, z_channels,
                           dtype, param_dtype),
        decoder=VAEDecoder(tuple(reversed(enc_channels)), num_res_blocks + 1,
                           out_channels, dtype, param_dtype),
        latent_channels=z_channels,
        embedding_channels=embedding_channels,
    )
