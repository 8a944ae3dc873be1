"""MDETR model assembly.

Parity with reference ``models/mdetr/model.py`` (MDETR:37,
mdetr_resnet101:176, mdetr_gqa_heads:232, mdetr_for_vqa:324,
mdetr_for_phrase_grounding:373-447).

jit-safe batching: the reference pads ragged image/text lists inside
``forward`` (:102-123); here padding happens HOST-SIDE via
``pad_images``/``pad_text`` (bucketed to avoid recompiles, SURVEY §7 hard
part 6) and the model consumes padded batches + masks.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.models.mdetr.image_encoder import (
    mdetr_resnet101_backbone,
    position_embedding_2d,
)
from multimodal_tpu.models.mdetr.text_encoder import (
    FeatureResizer,
    mdetr_roberta_text_encoder,
)
from multimodal_tpu.models.mdetr.transformer import (
    MDETRTransformer,
    MDETRTransformerOutput,
)
from multimodal_tpu.modules.layers.mlp import MLP


class MDETRModelOutput(NamedTuple):
    transformer_output: MDETRTransformerOutput
    pred_logits: jnp.ndarray
    pred_boxes: jnp.ndarray
    extra_embeddings: Optional[jnp.ndarray] = None


class MDETRVQAOutput(NamedTuple):
    model_output: MDETRModelOutput
    vqa_preds: Dict[str, jnp.ndarray]
    contrastive_embeddings: Optional[Dict[str, jnp.ndarray]] = None


class MDETRPhraseGroundingOutput(NamedTuple):
    model_output: MDETRModelOutput
    contrastive_embeddings: Dict[str, jnp.ndarray]


def pad_images(images: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side ragged->padded batching for NHWC images; mask True = padded."""
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    c = images[0].shape[2]
    batch = np.zeros((len(images), max_h, max_w, c), images[0].dtype)
    mask = np.ones((len(images), max_h, max_w), bool)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        batch[i, :h, :w] = im
        mask[i, :h, :w] = False
    return batch, mask


def pad_text(text: List[np.ndarray], padding_idx: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    max_len = max(len(t) for t in text)
    batch = np.full((len(text), max_len), padding_idx, np.int32)
    for i, t in enumerate(text):
        batch[i, : len(t)] = t
    return batch, batch == padding_idx


class MDETR(nn.Module):
    image_backbone: nn.Module
    text_encoder: nn.Module
    transformer: MDETRTransformer
    text_projection: nn.Module
    image_projection: nn.Module
    num_queries: int = 100
    num_extra_queries: int = 0
    hidden_dim: int = 256
    num_classes: int = 255
    pos_feats: int = 128
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,          # (b, H, W, 3) padded
        image_mask: jnp.ndarray,      # (b, H, W) True = padded
        text: jnp.ndarray,            # (b, L) padded token ids
        text_attention_mask: jnp.ndarray,  # (b, L) True = padded
        deterministic: bool = True,
    ) -> MDETRModelOutput:
        encoded_text = self.text_encoder(
            input_ids=text, attention_mask=~text_attention_mask,
            deterministic=deterministic,
        )
        text_memory = self.text_projection(
            encoded_text.last_hidden_state, deterministic=deterministic
        )

        feats, feat_mask = self.image_backbone(images, image_mask)
        pos = position_embedding_2d(
            feat_mask, num_pos_feats=self.pos_feats, scale=2 * math.pi
        ).astype(feats.dtype)
        img_proj = self.image_projection(feats)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries + self.num_extra_queries, self.hidden_dim),
            self.param_dtype,
        )
        tf_out = self.transformer(
            img_proj, feat_mask, query_embed, pos, text_memory,
            text_attention_mask, deterministic=deterministic,
        )

        extra_embeddings = None
        hs = tf_out.decoder_hidden_states
        if self.num_extra_queries > 0:
            extra_embeddings = hs[-1, :, -self.num_extra_queries:]
            hs = hs[:, :, : self.num_queries]
            tf_out = tf_out._replace(decoder_hidden_states=hs)

        final = hs[-1]
        outputs_class = nn.Dense(
            self.num_classes + 1, dtype=self.dtype, param_dtype=self.param_dtype,
            name="class_embed",
        )(final)
        outputs_coord = nn.sigmoid(
            MLP(self.hidden_dim, 4, [self.hidden_dim] * 2, dropout=0.0,
                activation="relu", dtype=self.dtype, param_dtype=self.param_dtype,
                name="bbox_embed")(final)
        )
        return MDETRModelOutput(tf_out, outputs_class, outputs_coord, extra_embeddings)


def mdetr_resnet101(
    num_queries: int = 100,
    num_classes: int = 255,
    embedding_dim: int = 768,
    transformer_d_model: int = 256,
    transformer_num_heads: int = 8,
    transformer_encoder_layers: int = 6,
    transformer_decoder_layers: int = 6,
    transformer_dim_feedforward: int = 2048,
    transformer_dropout: float = 0.1,
    return_intermediate_dec: bool = True,
    num_extra_query_embeddings: int = 0,
    text_encoder_kwargs: Optional[dict] = None,
    resnet_layers: Sequence[int] = (3, 4, 23, 3),
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> MDETR:
    common = dict(dtype=dtype, param_dtype=param_dtype)
    from multimodal_tpu.models.mdetr.image_encoder import (
        MaskedIntermediateLayer,
        ResNetBackbone,
    )

    image_backbone = MaskedIntermediateLayer(
        ResNetBackbone(layers=tuple(resnet_layers), **common)
    )
    text_encoder = mdetr_roberta_text_encoder(
        hidden_size=embedding_dim, **(text_encoder_kwargs or {}), **common
    )
    transformer = MDETRTransformer(
        d_model=transformer_d_model,
        num_heads=transformer_num_heads,
        num_encoder_layers=transformer_encoder_layers,
        num_decoder_layers=transformer_decoder_layers,
        dim_feedforward=transformer_dim_feedforward,
        dropout=transformer_dropout,
        return_intermediate_dec=return_intermediate_dec,
        **common,
    )
    text_projection = FeatureResizer(transformer_d_model, **common)
    image_projection = nn.Conv(transformer_d_model, (1, 1), **common)
    return MDETR(
        image_backbone=image_backbone,
        text_encoder=text_encoder,
        transformer=transformer,
        text_projection=text_projection,
        image_projection=image_projection,
        num_queries=num_queries,
        num_extra_queries=num_extra_query_embeddings,
        hidden_dim=transformer_d_model,
        num_classes=num_classes,
        pos_feats=transformer_d_model // 2,  # sine pos dim == d_model
        **common,
    )


class MDETRForVQA(nn.Module):
    """MDETR + per-task VQA heads over extra query embeddings
    (reference :263-366; GQA heads :232)."""

    model: MDETR
    vqa_heads: Dict[str, nn.Module]

    def __call__(self, images, image_mask, text, text_attention_mask,
                 deterministic: bool = True) -> MDETRVQAOutput:
        out = self.model(images, image_mask, text, text_attention_mask, deterministic)
        if out.extra_embeddings is None:
            raise ValueError("MDETRForVQA requires extra query embeddings")
        preds = {
            name: head(out.extra_embeddings[:, i])
            for i, (name, head) in enumerate(sorted(self.vqa_heads.items()))
        }
        return MDETRVQAOutput(out, preds)


class MDETRForPhraseGrounding(nn.Module):
    """MDETR + contrastive alignment projections (reference :373-447)."""

    model: MDETR
    contrastive_dim: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, image_mask, text, text_attention_mask,
                 deterministic: bool = True) -> MDETRPhraseGroundingOutput:
        out = self.model(images, image_mask, text, text_attention_mask, deterministic)
        dense = lambda name: nn.Dense(
            self.contrastive_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        query_emb = dense("contrastive_align_image")(
            out.transformer_output.decoder_hidden_states[-1]
        )
        token_emb = dense("contrastive_align_text")(
            out.transformer_output.text_memory
        )
        norm = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return MDETRPhraseGroundingOutput(
            out,
            {"query_embeddings": norm(query_emb), "token_embeddings": norm(token_emb)},
        )


def mdetr_gqa_heads(hidden_dim: int = 256) -> Dict[str, nn.Module]:
    """GQA answer-type heads (reference :232)."""
    sizes = {"answer_type": 5, "answer_obj": 3, "answer_rel": 1594,
             "answer_attr": 403, "answer_cat": 678, "answer_global": 111}
    return {
        name: MLP(hidden_dim, n, [hidden_dim], dropout=0.0, activation="relu")
        for name, n in sizes.items()
    }


def mdetr_for_vqa(num_extra_query_embeddings: int = 6, **kwargs: Any) -> MDETRForVQA:
    model = mdetr_resnet101(
        num_extra_query_embeddings=num_extra_query_embeddings, **kwargs
    )
    return MDETRForVQA(model=model, vqa_heads=mdetr_gqa_heads(model.hidden_dim))


def mdetr_for_phrase_grounding(contrastive_dim: int = 64, **kwargs: Any) -> MDETRForPhraseGrounding:
    return MDETRForPhraseGrounding(
        model=mdetr_resnet101(**kwargs), contrastive_dim=contrastive_dim
    )
