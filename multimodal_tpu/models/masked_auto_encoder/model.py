"""Masked Auto-Encoder (image + audio).

Parity with reference ``models/masked_auto_encoder/model.py``
(MaskedAutoEncoder:41, DecoderEmbeddings:193, image_mae:244, audio_mae:348,
and the vit_* builder family). NHWC inputs; masking RNG is the explicit
``patch_drop`` stream; training mode = ``deterministic=False``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.masked_auto_encoder.position_embeddings import (
    get_2d_sin_cos_embeddings,
)
from multimodal_tpu.models.masked_auto_encoder.swin_decoder import SwinTransformer
from multimodal_tpu.modules.encoders.vision_transformer import (
    VisionTransformer,
    vit_b_16,
    vit_l_16,
)
from multimodal_tpu.modules.layers.patch_embedding import PatchEmbeddings
from multimodal_tpu.modules.layers.transformer import (
    TransformerEncoder,
    TransformerOutput,
)

import jax


class MAEOutput(NamedTuple):
    encoder_output: Union[TransformerOutput, jnp.ndarray]
    decoder_pred: Optional[jnp.ndarray] = None
    label_patches: Optional[jnp.ndarray] = None
    mask: Optional[jnp.ndarray] = None


class DecoderEmbeddings(nn.Module):
    """Project encoder outputs, re-insert mask tokens by ids_restore, add
    fixed sin-cos position embeddings (reference model.py:193)."""

    encoder_embed_dim: int
    decoder_embed_dim: int
    image_size: Union[int, Tuple[int, int]] = 224
    patch_size: int = 16
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ids_restore: jnp.ndarray) -> jnp.ndarray:
        img = self.image_size
        img = (img, img) if isinstance(img, int) else tuple(img)
        num_patches_h = img[0] // self.patch_size
        num_patches_w = img[1] // self.patch_size
        num_patches = num_patches_h * num_patches_w

        x = nn.Dense(self.decoder_embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="decoder_embed")(x)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02),
            (1, 1, self.decoder_embed_dim), self.param_dtype,
        )

        b = x.shape[0]
        n_masked = ids_restore.shape[1] + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(
            mask_token.astype(x.dtype), (b, n_masked, self.decoder_embed_dim)
        )
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)  # drop cls
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)  # unshuffle
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)  # cls back

        def sincos_init(_key, shape, dtype):
            return get_2d_sin_cos_embeddings(
                self.decoder_embed_dim, (num_patches_w, num_patches_h)
            ).astype(dtype)

        pos = jax.lax.stop_gradient(
            self.param(
                "position_embeddings", sincos_init,
                (1, num_patches + 1, self.decoder_embed_dim), self.param_dtype,
            )
        )
        return x + pos.astype(x.dtype)


class MaskedAutoEncoder(nn.Module):
    """Mask patches -> encode kept -> decode full grid -> predict pixels."""

    encoder_transformer: nn.Module
    decoder_transformer: nn.Module
    input_size: Union[int, Tuple[int, int]] = 224
    patch_size: int = 16
    num_channels: int = 3
    embed_dim: int = 768
    masking_ratio: float = 0.75
    decoder_embed_dim: int = 512
    use_cls_in_decoder: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.embeddings = PatchEmbeddings(
            image_size=self.input_size,
            patch_size=self.patch_size,
            num_channels=self.num_channels,
            hidden_size=self.embed_dim,
            patch_drop_rate=self.masking_ratio,
            use_fixed_sincos_pos=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.decoder_embed = DecoderEmbeddings(
            encoder_embed_dim=self.embed_dim,
            decoder_embed_dim=self.decoder_embed_dim,
            image_size=self.input_size,
            patch_size=self.patch_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.decoder_pred = nn.Dense(
            self.patch_size ** 2 * self.num_channels,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def _patchify_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC -> (b, n_patches, patch²·c), per-patch layout (p_h, p_w, c)."""
        b, h, w, c = x.shape
        p = self.patch_size
        nh, nw = h // p, w // p
        patches = x.reshape(b, nh, p, nw, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)
        return patches.reshape(b, nh * nw, p * p * c)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> MAEOutput:
        embedding_out = self.embeddings(x, deterministic=deterministic)
        encoder_out = self.encoder_transformer(
            embedding_out.embeddings, deterministic=deterministic
        )
        if deterministic:
            # eval mode returns the encoder only (reference model.py:166-168)
            return MAEOutput(encoder_out)

        decoder_embedding = self.decoder_embed(
            encoder_out.last_hidden_state, embedding_out.ids_restore
        )
        decoder_input = decoder_embedding
        if not self.use_cls_in_decoder:
            decoder_input = decoder_input[:, 1:, :]
        decoder_out = self.decoder_transformer(
            decoder_input, deterministic=deterministic
        )
        pred = self.decoder_pred(decoder_out.last_hidden_state)
        if self.use_cls_in_decoder:
            pred = pred[:, 1:, :]

        return MAEOutput(
            encoder_output=encoder_out,
            decoder_pred=pred,
            label_patches=self._patchify_input(x),
            mask=embedding_out.random_mask,
        )


def image_mae(
    *,
    image_size: int = 224,
    patch_size: int = 16,
    masking_ratio: float = 0.75,
    encoder_layers: int = 12,
    encoder_hidden_dim: int = 768,
    encoder_heads: int = 12,
    encoder_dim_feedforward: int = 3072,
    encoder_layer_norm_eps: float = 1e-6,
    encoder_activation: Union[str, Callable] = "gelu",
    encoder_final_layer_norm_eps: float = 1e-6,
    decoder_layers: int = 8,
    decoder_hidden_dim: int = 512,
    decoder_heads: int = 16,
    decoder_dim_feedforward: int = 2048,
    decoder_layer_norm_eps: float = 1e-6,
    decoder_activation: Union[str, Callable] = "gelu",
    decoder_final_layer_norm_eps: float = 1e-6,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> MaskedAutoEncoder:
    encoder_transformer = TransformerEncoder(
        n_layer=encoder_layers, d_model=encoder_hidden_dim, n_head=encoder_heads,
        dim_feedforward=encoder_dim_feedforward,
        final_layer_norm_eps=encoder_final_layer_norm_eps,
        layer_norm_eps=encoder_layer_norm_eps, norm_first=True,
        activation=encoder_activation, dtype=dtype, param_dtype=param_dtype,
    )
    decoder_transformer = TransformerEncoder(
        n_layer=decoder_layers, d_model=decoder_hidden_dim, n_head=decoder_heads,
        dim_feedforward=decoder_dim_feedforward,
        layer_norm_eps=decoder_layer_norm_eps,
        final_layer_norm_eps=decoder_final_layer_norm_eps, norm_first=True,
        activation=decoder_activation, dtype=dtype, param_dtype=param_dtype,
    )
    return MaskedAutoEncoder(
        encoder_transformer=encoder_transformer,
        decoder_transformer=decoder_transformer,
        input_size=image_size,
        patch_size=patch_size,
        num_channels=3,
        embed_dim=encoder_hidden_dim,
        masking_ratio=masking_ratio,
        decoder_embed_dim=decoder_hidden_dim,
        dtype=dtype,
        param_dtype=param_dtype,
    )


def vit_l_16_image_mae(**kwargs: Any) -> MaskedAutoEncoder:
    return image_mae(
        image_size=224, patch_size=16, masking_ratio=0.75,
        encoder_layers=24, encoder_hidden_dim=1024, encoder_heads=16,
        encoder_dim_feedforward=4096,
        decoder_layers=8, decoder_hidden_dim=512, decoder_heads=16,
        decoder_dim_feedforward=2048, **kwargs,
    )


def vit_b_16_image_mae_encoder(**kwargs: Any) -> VisionTransformer:
    return vit_b_16(final_layer_norm_eps=None, **kwargs)


def vit_l_16_image_mae_encoder(**kwargs: Any) -> VisionTransformer:
    return vit_l_16(final_layer_norm_eps=None, **kwargs)


def audio_mae(
    *,
    input_size: Tuple[int, int] = (1024, 128),
    patch_size: int = 16,
    masking_ratio: float = 0.8,
    encoder_layers: int = 12,
    encoder_hidden_dim: int = 768,
    encoder_heads: int = 16,
    encoder_dim_feedforward: int = 3072,
    encoder_layer_norm_eps: float = 1e-6,
    encoder_activation: Union[str, Callable] = "gelu",
    encoder_final_layer_norm_eps: float = 1e-6,
    window_size: Tuple[int, int] = (4, 4),
    decoder_layers: int = 16,
    decoder_hidden_dim: int = 512,
    decoder_heads: int = 16,
    decoder_dim_feedforward: int = 2048,
    decoder_layer_norm_eps: float = 1e-5,
    decoder_final_layer_norm_eps: float = 1e-5,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> MaskedAutoEncoder:
    encoder_transformer = TransformerEncoder(
        n_layer=encoder_layers, d_model=encoder_hidden_dim, n_head=encoder_heads,
        dim_feedforward=encoder_dim_feedforward,
        final_layer_norm_eps=encoder_final_layer_norm_eps,
        layer_norm_eps=encoder_layer_norm_eps, norm_first=True,
        activation=encoder_activation, dtype=dtype, param_dtype=param_dtype,
    )
    decoder_input_size = (input_size[0] // patch_size, input_size[1] // patch_size)
    decoder_transformer = SwinTransformer(
        n_layer=decoder_layers,
        input_dim=decoder_hidden_dim,
        feedforward_dim=decoder_dim_feedforward,
        num_heads=decoder_heads,
        input_size=decoder_input_size,
        window_size=window_size,
        layer_norm_eps=decoder_layer_norm_eps,
        final_layer_norm_eps=decoder_final_layer_norm_eps,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    return MaskedAutoEncoder(
        encoder_transformer=encoder_transformer,
        decoder_transformer=decoder_transformer,
        input_size=input_size,
        patch_size=patch_size,
        num_channels=1,
        embed_dim=encoder_hidden_dim,
        masking_ratio=masking_ratio,
        decoder_embed_dim=decoder_hidden_dim,
        use_cls_in_decoder=False,
        dtype=dtype,
        param_dtype=param_dtype,
    )


def vit_s_16_audio_mae(**kwargs: Any) -> MaskedAutoEncoder:
    return audio_mae(
        encoder_layers=12, encoder_hidden_dim=384, encoder_heads=6,
        encoder_dim_feedforward=1536, **kwargs,
    )


def vit_b_16_audio_mae(**kwargs: Any) -> MaskedAutoEncoder:
    return audio_mae(
        encoder_layers=12, encoder_hidden_dim=768, encoder_heads=12,
        encoder_dim_feedforward=3072, **kwargs,
    )


def vit_l_16_audio_mae(**kwargs: Any) -> MaskedAutoEncoder:
    return audio_mae(
        encoder_layers=24, encoder_hidden_dim=1024, encoder_heads=16,
        encoder_dim_feedforward=4096, **kwargs,
    )


def vit_b_16_audio_mae_encoder(**kwargs: Any) -> VisionTransformer:
    return vit_b_16(
        final_layer_norm_eps=None, num_channels=1, image_size=(1024, 128), **kwargs
    )
