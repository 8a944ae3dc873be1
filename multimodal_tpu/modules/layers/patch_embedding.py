"""Patch embeddings for vision transformers.

Parity with reference ``modules/layers/patch_embedding.py:25``
(PatchEmbeddings): conv patchify + CLS + learned position embeddings,
BEiT-style mask-token substitution, MAE-style patch dropping (1-d and 2-d).

TPU note: the patchify conv is expressed as a Conv with stride = kernel =
patch size, which XLA lowers to a single reshaped matmul on the MXU.
Images are channel-last (NHWC) — the native TPU layout — unlike the
reference's NCHW.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.masking.random_masking import (
    random_masking,
    random_masking_2d,
)


class PatchEmbeddingsOutput(NamedTuple):
    embeddings: jnp.ndarray
    random_mask: Optional[jnp.ndarray] = None
    ids_restore: Optional[jnp.ndarray] = None


class PatchEmbeddings(nn.Module):
    """Conv patchify + CLS + learned pos-emb (+ masking options).

    Input: ``(batch, height, width, channels)`` (NHWC).
    """

    image_size: Union[int, Tuple[int, int]] = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    hidden_dropout_prob: float = 0.0
    use_image_masking: bool = False
    patch_drop_rate: Optional[Union[float, Tuple[float, float]]] = None
    include_cls_embed: bool = True
    use_fixed_sincos_pos: bool = False  # MAE: frozen 2-d sin-cos pos embeddings
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def _image_size(self) -> Tuple[int, int]:
        s = self.image_size
        return (s, s) if isinstance(s, int) else tuple(s)

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        image_patches_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> PatchEmbeddingsOutput:
        img_h, img_w = self._image_size
        if img_h % self.patch_size or img_w % self.patch_size:
            raise ValueError("Image size needs to be divisible by patch size")
        num_patches_h = img_h // self.patch_size
        num_patches_w = img_w // self.patch_size
        num_patches = num_patches_h * num_patches_w

        batch_size, height, width, _ = pixel_values.shape
        if (height, width) != (img_h, img_w):
            raise ValueError(
                f"Input image size ({height}x{width}) doesn't match configured "
                f"({img_h}x{img_w})"
            )

        fan_in = self.num_channels * self.patch_size ** 2
        embeddings = nn.Conv(
            self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=nn.initializers.truncated_normal(
                stddev=math.sqrt(1 / fan_in), lower=-2.0, upper=2.0
            ),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_projection",
        )(pixel_values)
        embeddings = embeddings.reshape(batch_size, num_patches, self.hidden_size)

        pos_seq = num_patches + 1 if self.include_cls_embed else num_patches
        if self.use_fixed_sincos_pos:
            from multimodal_tpu.models.masked_auto_encoder.position_embeddings import (
                get_2d_sin_cos_embeddings,
            )

            def sincos_init(_key, shape, dtype):
                emb = get_2d_sin_cos_embeddings(
                    self.hidden_size, (num_patches_w, num_patches_h),
                    include_cls_embed=self.include_cls_embed,
                )
                return emb.astype(dtype)

            position_embeddings = jax.lax.stop_gradient(
                self.param(
                    "position_embeddings", sincos_init,
                    (1, pos_seq, self.hidden_size), self.param_dtype,
                )
            )
        else:
            position_embeddings = self.param(
                "position_embeddings", nn.initializers.zeros,
                (1, pos_seq, self.hidden_size), self.param_dtype,
            )

        if image_patches_mask is not None:
            if self.use_image_masking:
                mask_token = self.param(
                    "mask_token", nn.initializers.zeros,
                    (1, 1, self.hidden_size), self.param_dtype,
                )
                w = image_patches_mask[..., None].astype(embeddings.dtype)
                embeddings = embeddings * (1 - w) + mask_token.astype(embeddings.dtype) * w
            # else: silently ignore, mirroring the reference's warning path

        if self.include_cls_embed:
            embeddings = embeddings + position_embeddings[:, 1:, :].astype(embeddings.dtype)
        else:
            embeddings = embeddings + position_embeddings.astype(embeddings.dtype)

        random_mask = None
        ids_restore = None
        if not deterministic and self.patch_drop_rate is not None:
            rng = self.make_rng("patch_drop")
            if isinstance(self.patch_drop_rate, (tuple, list)):
                embeddings = random_masking_2d(
                    rng, embeddings,
                    mask_ratio_h=self.patch_drop_rate[0],
                    mask_ratio_w=self.patch_drop_rate[1],
                    num_patches_h=num_patches_h,
                    num_patches_w=num_patches_w,
                )
            else:
                embeddings, random_mask, ids_restore, _ = random_masking(
                    rng, embeddings, mask_ratio=self.patch_drop_rate
                )

        if self.include_cls_embed:
            cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.hidden_size), self.param_dtype
            )
            cls = (cls_token + position_embeddings[:, :1, :]).astype(embeddings.dtype)
            embeddings = jnp.concatenate(
                [jnp.broadcast_to(cls, (batch_size, 1, self.hidden_size)), embeddings], axis=1
            )

        embeddings = nn.Dropout(self.hidden_dropout_prob, deterministic=deterministic)(embeddings)
        return PatchEmbeddingsOutput(embeddings, random_mask, ids_restore)
