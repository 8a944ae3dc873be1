"""CLIP: generic two-encoder contrastive model + ViT builders.

Parity with reference ``models/clip/model.py`` (CLIP:36, CLIPOutput,
clip_vit_b16/b32/l14:77-114, CLIP_MODEL_MAPPING:24-33). The ResNet
image-encoder variants (``clip_rn50`` etc.) live in ``resnet_encoder.py``.

Pretrained loading: ``clip_vit_b32(pretrained=True)`` resolves the reference
checkpoint URL through the local cache (``utils/pretrained.py``), converts
the torch state dict with ``clip_params_from_torch``, and returns
``(model, params)``; pass a local ``.pt`` path to load an on-disk checkpoint.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.clip.image_encoder import CLIPViTEncoder
from multimodal_tpu.models.clip.text_encoder import CLIPTextEncoder


class CLIPOutput(NamedTuple):
    embeddings_a: jnp.ndarray
    embeddings_b: jnp.ndarray


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


class CLIP(nn.Module):
    """Two-encoder contrastive wrapper: encode both, L2-normalize both."""

    encoder_a: nn.Module
    encoder_b: nn.Module

    def __call__(self, features_a: jnp.ndarray, features_b: jnp.ndarray) -> CLIPOutput:
        embeddings_a = _l2_normalize(self.encoder_a(features_a))
        embeddings_b = _l2_normalize(self.encoder_b(features_b))
        return CLIPOutput(embeddings_a=embeddings_a, embeddings_b=embeddings_b)

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return _l2_normalize(self.encoder_a(images))

    def encode_text(self, text: jnp.ndarray) -> jnp.ndarray:
        return _l2_normalize(self.encoder_b(text))


def _load_clip_vit_pretrained(
    model: CLIP, pretrained: Union[bool, str], map_key: str,
    n_vision_layers: int, n_text_layers: int,
) -> Tuple[CLIP, Any]:
    from multimodal_tpu.utils.checkpoint import (
        clip_params_from_torch,
        hf_clip_params_from_torch,
    )
    from multimodal_tpu.utils.pretrained import (
        CLIP_MODEL_MAPPING,
        load_torch_state_dict,
        resolve_checkpoint,
    )

    ckpt = resolve_checkpoint(pretrained, CLIP_MODEL_MAPPING, map_key)
    sd = load_torch_state_dict(ckpt)
    # auto-detect checkpoint flavor: HuggingFace CLIPModel exports
    # (openai/clip-vit-* on the Hub) vs the reference's torchmultimodal naming
    if any(k.startswith("vision_model.") for k in sd):
        params = hf_clip_params_from_torch(
            sd, n_vision_layers=n_vision_layers, n_text_layers=n_text_layers
        )
    else:
        params = clip_params_from_torch(
            sd, n_vision_layers=n_vision_layers, n_text_layers=n_text_layers
        )
    return model, params


def clip_vit_b16(
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    pretrained: Union[bool, str] = False,
):
    vision_encoder = CLIPViTEncoder(
        image_size=224, patch_size=16, layers=12, heads=12, width=768,
        embedding_dim=512, dtype=dtype, param_dtype=param_dtype,
    )
    text_encoder = CLIPTextEncoder(
        embedding_dim=512, dtype=dtype, param_dtype=param_dtype
    )
    model = CLIP(vision_encoder, text_encoder)
    if pretrained:
        return _load_clip_vit_pretrained(model, pretrained, "vit_b16", 12, 12)
    return model


def clip_vit_b32(
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    pretrained: Union[bool, str] = False,
):
    vision_encoder = CLIPViTEncoder(
        image_size=224, patch_size=32, layers=12, heads=12, width=768,
        embedding_dim=512, dtype=dtype, param_dtype=param_dtype,
    )
    text_encoder = CLIPTextEncoder(
        embedding_dim=512, dtype=dtype, param_dtype=param_dtype
    )
    model = CLIP(vision_encoder, text_encoder)
    if pretrained:
        return _load_clip_vit_pretrained(model, pretrained, "vit_b32", 12, 12)
    return model


def _clip_resnet(layers, output_dim, heads, width, text_kwargs, input_resolution=224,
                 dtype=jnp.float32, param_dtype=jnp.float32) -> CLIP:
    from multimodal_tpu.models.clip.resnet_encoder import ResNetForCLIP

    vision_encoder = ResNetForCLIP(
        layers=layers, output_dim=output_dim, heads=heads, width=width,
        input_resolution=input_resolution, dtype=dtype, param_dtype=param_dtype,
    )
    text_encoder = CLIPTextEncoder(dtype=dtype, param_dtype=param_dtype, **text_kwargs)
    return CLIP(vision_encoder, text_encoder)


def clip_rn50(**kw: Any) -> CLIP:
    return _clip_resnet((3, 4, 6, 3), 1024, 32, 64, dict(embedding_dim=1024), **kw)


def clip_rn101(**kw: Any) -> CLIP:
    return _clip_resnet((3, 4, 23, 3), 512, 32, 64, dict(embedding_dim=512), **kw)


def clip_rn50x4(**kw: Any) -> CLIP:
    return _clip_resnet(
        (4, 6, 10, 6), 640, 40, 80,
        dict(embedding_dim=640, width=640, dim_feedforward=2560, heads=10),
        input_resolution=288, **kw,
    )


def clip_rn50x16(**kw: Any) -> CLIP:
    return _clip_resnet(
        (6, 8, 18, 8), 768, 48, 96,
        dict(embedding_dim=768, width=768, dim_feedforward=3072, heads=12),
        input_resolution=384, **kw,
    )


def clip_rn50x64(**kw: Any) -> CLIP:
    return _clip_resnet(
        (3, 15, 36, 10), 1024, 64, 128,
        dict(embedding_dim=1024, width=1024, dim_feedforward=4096, heads=16),
        input_resolution=448, **kw,
    )


def clip_vit_l14(
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    pretrained: Union[bool, str] = False,
):
    vision_encoder = CLIPViTEncoder(
        image_size=224, patch_size=14, layers=24, heads=16, width=1024,
        embedding_dim=768, dtype=dtype, param_dtype=param_dtype,
    )
    text_encoder = CLIPTextEncoder(
        embedding_dim=768, width=768, dim_feedforward=3072, heads=12,
        dtype=dtype, param_dtype=param_dtype,
    )
    model = CLIP(vision_encoder, text_encoder)
    if pretrained:
        return _load_clip_vit_pretrained(model, pretrained, "vit_l14", 24, 12)
    return model
