"""CoCa model assembly.

Parity with reference ``models/coca/coca_model.py`` (CoCaModel:34,
coca_vit:133, coca_vit_b_32:351, coca_vit_l_14:376, CoCaForPretraining:401,
coca_for_pretraining:457, CoCaModelWithHeads:465).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.coca.multimodal_decoder import CoCaMultimodalDecoder
from multimodal_tpu.models.coca.text_decoder import CoCaTextDecoder
from multimodal_tpu.modules.encoders.vision_transformer import vision_transformer
from multimodal_tpu.modules.layers.attention_pooler import (
    AttentionPooler,
    CascadedAttentionPooler,
)
from multimodal_tpu.modules.layers.transformer import TransformerOutput
from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
    ContrastiveLossWithTemperature,
    cross_entropy,
)
from multimodal_tpu.parallel.collectives import BackpropType


class MultimodalOutput(NamedTuple):
    image_pooled_output: jnp.ndarray
    text_pooled_output: jnp.ndarray
    multimodal_embeddings: jnp.ndarray
    multimodal_pooled_embeddings: Optional[jnp.ndarray] = None


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class CoCaModel(nn.Module):
    vision_encoder: nn.Module
    text_decoder: CoCaTextDecoder
    multimodal_decoder: CoCaMultimodalDecoder
    vision_pooler: nn.Module
    vision_proj: nn.Module

    def __call__(
        self,
        images: jnp.ndarray,
        texts: jnp.ndarray,
        text_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> MultimodalOutput:
        vision_out = self.vision_encoder(images, deterministic=deterministic)
        if isinstance(vision_out, TransformerOutput):
            image_embeddings = vision_out.last_hidden_state
        elif isinstance(vision_out, tuple):
            image_embeddings = vision_out[0]
        else:
            image_embeddings = vision_out

        pooled = self.vision_pooler(image_embeddings)
        if isinstance(pooled, (list, tuple)):
            # cascaded: [captioning tokens, contrastive token]
            captioning_image_embeddings, contrastive_image_embeddings = pooled
            contrastive_image_embeddings = contrastive_image_embeddings[:, 0]
        else:
            # parallel: token 0 contrastive, rest captioning
            contrastive_image_embeddings = pooled[:, 0]
            captioning_image_embeddings = pooled[:, 1:]
        contrastive_image_embeddings = _l2norm(
            self.vision_proj(contrastive_image_embeddings)
        )

        pooled_text, text_tokens = self.text_decoder(
            texts, text_padding_mask, deterministic=deterministic
        )
        contrastive_text_embeddings = _l2norm(pooled_text)

        multimodal_embeddings = self.multimodal_decoder(
            text_tokens, captioning_image_embeddings, deterministic=deterministic
        )
        return MultimodalOutput(
            contrastive_image_embeddings,
            contrastive_text_embeddings,
            multimodal_embeddings,
        )


def coca_vit(
    *,
    vision_patch_size: int,
    vision_dim_feedforward: int,
    vision_n_layer: int,
    vision_n_head: int,
    vocab_size: int,
    num_text_positions: int,
    text_hidden_dim: int,
    text_n_layer: int,
    text_n_head: int,
    text_dim_feedforward: int,
    text_output_dim: int,
    fusion_n_layer: int,
    fusion_n_head: int,
    fusion_dim_feedforward: int,
    pooler_input_embed_dim: int,
    pooler_output_embed_dim: int,
    pooler_n_head: int,
    image_size: Union[int, Tuple[int, int]] = 224,
    num_channels: int = 3,
    vision_activation: Union[str, Callable] = "gelu",
    vision_transformer_dropout: float = 0.0,
    patch_embed_dropout_prob: float = 0.0,
    vision_layer_norm_eps: float = 1e-5,
    vision_final_layer_norm_eps: Optional[float] = None,
    vision_norm_first: bool = True,
    vision_include_cls_embed: bool = False,
    vision_drop_path_rate: Optional[float] = None,
    vision_patch_drop_rate: Optional[Union[float, Tuple[float, float]]] = None,
    pad_idx: Optional[int] = 0,
    text_embed_cls: bool = True,
    text_dropout: float = 0.0,
    text_activation: Union[str, Callable] = "gelu",
    text_layer_norm_eps: float = 1e-5,
    text_norm_first: bool = True,
    text_final_layer_norm_eps: Optional[float] = 1e-5,
    fusion_dropout: float = 0.0,
    fusion_activation: Union[str, Callable] = "gelu",
    fusion_layer_norm_eps: float = 1e-5,
    fusion_norm_first: bool = True,
    fusion_final_layer_norm_eps: Optional[float] = 1e-5,
    multimodal_output_projection_dim: Optional[int] = None,
    cascaded_pooler: bool = True,
    pooler_n_queries: int = 256,
    pooler_layer_norm_eps: float = 1e-5,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> CoCaModel:
    common = dict(dtype=dtype, param_dtype=param_dtype)
    if cascaded_pooler:
        captioning_pooler = AttentionPooler(
            input_embed_dim=pooler_input_embed_dim,
            output_embed_dim=pooler_output_embed_dim,
            n_head=pooler_n_head,
            n_queries=pooler_n_queries,
            layer_norm_eps=pooler_layer_norm_eps,
            **common,
        )
        contrastive_pooler = AttentionPooler(
            input_embed_dim=pooler_output_embed_dim,
            output_embed_dim=pooler_output_embed_dim,
            n_head=pooler_n_head,
            n_queries=1,
            layer_norm_eps=pooler_layer_norm_eps,
            **common,
        )
        attention_pooler: nn.Module = CascadedAttentionPooler(
            [captioning_pooler, contrastive_pooler]
        )
    else:
        attention_pooler = AttentionPooler(
            input_embed_dim=pooler_input_embed_dim,
            output_embed_dim=pooler_output_embed_dim,
            n_head=pooler_n_head,
            n_queries=pooler_n_queries + 1,
            layer_norm_eps=pooler_layer_norm_eps,
            **common,
        )

    vision_proj = nn.Dense(
        pooler_output_embed_dim, use_bias=False,
        kernel_init=nn.initializers.normal(pooler_input_embed_dim ** -0.5),
        **common,
    )
    vision_encoder = vision_transformer(
        patch_size=vision_patch_size,
        hidden_dim=pooler_input_embed_dim,
        dim_feedforward=vision_dim_feedforward,
        n_layer=vision_n_layer,
        n_head=vision_n_head,
        image_size=image_size,
        num_channels=num_channels,
        activation=vision_activation,
        transformer_dropout=vision_transformer_dropout,
        patch_embed_dropout_prob=patch_embed_dropout_prob,
        layer_norm_eps=vision_layer_norm_eps,
        final_layer_norm_eps=vision_final_layer_norm_eps,
        norm_first=vision_norm_first,
        include_cls_embed=vision_include_cls_embed,
        drop_path_rate=vision_drop_path_rate,
        patch_drop_rate=vision_patch_drop_rate,
        **common,
    )
    text_decoder = CoCaTextDecoder(
        vocab_size=vocab_size,
        num_positions=num_text_positions,
        embedding_dim=text_hidden_dim,
        n_layer=text_n_layer,
        n_head=text_n_head,
        dim_feedforward=text_dim_feedforward,
        output_dim=text_output_dim,
        pad_idx=pad_idx,
        embed_cls=text_embed_cls,
        dropout=text_dropout,
        activation=text_activation,
        layer_norm_eps=text_layer_norm_eps,
        norm_first=text_norm_first,
        final_layer_norm_eps=text_final_layer_norm_eps,
        **common,
    )
    mm_input_seq_len = num_text_positions - 1 if text_embed_cls else num_text_positions
    multimodal_decoder = CoCaMultimodalDecoder(
        input_seq_len=mm_input_seq_len,
        text_embedding_dim=pooler_output_embed_dim,
        n_layer=fusion_n_layer,
        n_head=fusion_n_head,
        dim_feedforward=fusion_dim_feedforward,
        output_dim=multimodal_output_projection_dim,
        dropout=fusion_dropout,
        activation=fusion_activation,
        layer_norm_eps=fusion_layer_norm_eps,
        norm_first=fusion_norm_first,
        final_layer_norm_eps=fusion_final_layer_norm_eps,
        **common,
    )
    return CoCaModel(
        vision_encoder=vision_encoder,
        text_decoder=text_decoder,
        multimodal_decoder=multimodal_decoder,
        vision_proj=vision_proj,
        vision_pooler=attention_pooler,
    )


def coca_vit_b_32(**kwargs: Any) -> CoCaModel:
    return coca_vit(
        vision_patch_size=32, vision_n_layer=12, vision_n_head=12,
        vision_dim_feedforward=3072, vision_include_cls_embed=False,
        vocab_size=49408, num_text_positions=77, text_hidden_dim=512,
        text_n_layer=12, text_n_head=8, text_dim_feedforward=2048,
        text_output_dim=512, fusion_n_layer=12, fusion_n_head=8,
        fusion_dim_feedforward=2048, multimodal_output_projection_dim=49408,
        pooler_input_embed_dim=768, pooler_output_embed_dim=512,
        pooler_n_head=8, cascaded_pooler=True, **kwargs,
    )


def coca_vit_l_14(**kwargs: Any) -> CoCaModel:
    return coca_vit(
        vision_patch_size=14, vision_n_layer=24, vision_n_head=16,
        vision_dim_feedforward=4096, vision_include_cls_embed=False,
        vocab_size=49408, num_text_positions=77, text_hidden_dim=768,
        text_n_layer=12, text_n_head=12, text_dim_feedforward=3072,
        text_output_dim=768, fusion_n_layer=12, fusion_n_head=12,
        fusion_dim_feedforward=3072, multimodal_output_projection_dim=49408,
        pooler_input_embed_dim=1024, pooler_output_embed_dim=768,
        pooler_n_head=8, cascaded_pooler=True, **kwargs,
    )


class CoCaForPretraining(nn.Module):
    """Contrastive + captioning losses over CoCaModel (reference :401)."""

    model: CoCaModel
    pad_idx: int = 0
    contrastive_logit_scale_min: Optional[float] = math.log(1.0)
    contrastive_logit_scale_max: Optional[float] = math.log(100.0)

    def setup(self):
        self.contrastive_loss = ContrastiveLossWithTemperature(
            logit_scale_min=self.contrastive_logit_scale_min,
            logit_scale_max=self.contrastive_logit_scale_max,
        )

    def __call__(
        self,
        images: jnp.ndarray,
        texts: jnp.ndarray,
        text_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        axis_name: Optional[str] = None,
    ) -> Dict[str, jnp.ndarray]:
        model_outs = self.model(
            images, texts, text_padding_mask, deterministic=deterministic
        )
        captioning_labels = texts[:, 1:]
        contrastive_loss = self.contrastive_loss(
            model_outs.image_pooled_output,
            model_outs.text_pooled_output,
            backprop_type=BackpropType.GLOBAL,
            axis_name=axis_name,
        )
        logits = model_outs.multimodal_embeddings
        vocab_size = logits.shape[-1]
        valid = (captioning_labels != self.pad_idx).reshape(-1)
        captioning_loss = cross_entropy(
            logits.reshape(-1, vocab_size),
            captioning_labels.reshape(-1),
            weights=valid.astype(jnp.float32),
        )
        return {"contrastive": contrastive_loss, "captioning": captioning_loss}


def coca_for_pretraining(pad_idx: int = 0, **kwargs: Any) -> CoCaForPretraining:
    return CoCaForPretraining(coca_vit(**kwargs), pad_idx=pad_idx)


class CoCaModelWithHeads(nn.Module):
    """CoCa trunk + dict of task heads over pooled multimodal embeddings."""

    model: CoCaModel
    heads: Dict[str, nn.Module]
    pad_idx: int = 0
    pooler: Optional[Callable] = None  # default: last token

    def __call__(
        self,
        images: jnp.ndarray,
        texts: jnp.ndarray,
        text_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        model_out = self.model(
            images, texts, text_padding_mask, deterministic=deterministic
        )
        mm = model_out.multimodal_embeddings
        pooled = self.pooler(mm) if self.pooler is not None else mm[:, -1]
        pooled = pooled.reshape(mm.shape[0], -1)
        return {k: head(pooled) for k, head in self.heads.items()}
