"""FLAVA model assembly.

Parity with reference ``models/flava/model.py`` (FLAVAModel:106,
FLAVAForPreTraining:301, FLAVAForClassification:380,
flava_multimodal_encoder:74, flava_model:428,
flava_model_for_pretraining:524, flava_model_for_classification:547).

Forward computes unmasked + masked unimodal passes and the masked
multimodal pass (4 encoder passes + mm encoder per step — the reference's
exact training graph, SURVEY §3.2). The mm encoder consumes the LAST
PRE-FINAL-LN hidden state (``hidden_states[-1]``) of each unimodal tower.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.flava.dalle_vae import DalleVAEEncoder
from multimodal_tpu.models.flava.image_encoder import flava_image_encoder
from multimodal_tpu.models.flava.text_encoder import flava_text_encoder
from multimodal_tpu.models.flava.transformer import FLAVATransformerWithoutEmbeddings
from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm
from multimodal_tpu.modules.layers.transformer import (
    TransformerEncoder,
    TransformerOutput,
)
from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
    cross_entropy,
)
from multimodal_tpu.modules.losses.flava import (
    FLAVAPretrainingLoss,
    FLAVAPretrainingLossOutput,
    Pooler,
)

import jax


class FLAVAOutput(NamedTuple):
    image: TransformerOutput = TransformerOutput()
    image_masked: TransformerOutput = TransformerOutput()
    text: TransformerOutput = TransformerOutput()
    text_masked: TransformerOutput = TransformerOutput()
    multimodal: TransformerOutput = TransformerOutput()
    multimodal_masked: TransformerOutput = TransformerOutput()
    projected_image_embeddings: Optional[jnp.ndarray] = None
    projected_text_embeddings: Optional[jnp.ndarray] = None


class FLAVAForClassificationOutput(NamedTuple):
    logits: jnp.ndarray
    loss: Optional[jnp.ndarray]


def flava_multimodal_encoder(
    hidden_size: int = 768,
    num_attention_heads: int = 12,
    num_hidden_layers: int = 12,
    dropout: float = 0.0,
    intermediate_size: int = 3072,
    intermediate_activation: Union[str, Callable] = "gelu",
    layer_norm_eps: float = 1e-12,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    remat: bool = False,
    scan_layers: bool = False,
    moe_num_experts: Optional[int] = None,
    moe_top_k: int = 2,
    moe_capacity_factor: float = 1.25,
    moe_interval: int = 2,
    ep_axis_name: Optional[str] = None,
) -> FLAVATransformerWithoutEmbeddings:
    encoder = TransformerEncoder(
        n_layer=num_hidden_layers,
        d_model=hidden_size,
        n_head=num_attention_heads,
        dim_feedforward=intermediate_size,
        activation=intermediate_activation,
        layer_norm_eps=layer_norm_eps,
        dropout=dropout,
        norm_first=True,
        dtype=dtype,
        param_dtype=param_dtype,
        remat=remat,
        scan_layers=scan_layers,
        moe_num_experts=moe_num_experts,
        moe_top_k=moe_top_k,
        moe_capacity_factor=moe_capacity_factor,
        moe_interval=moe_interval,
        ep_axis_name=ep_axis_name,
    )
    return FLAVATransformerWithoutEmbeddings(
        encoder=encoder,
        layernorm=Fp32LayerNorm(eps=layer_norm_eps, param_dtype=param_dtype),
        pooler=Pooler(hidden_size=hidden_size, dtype=dtype, param_dtype=param_dtype),
        hidden_size=hidden_size,
        param_dtype=param_dtype,
    )


class FLAVAModel(nn.Module):
    image_encoder: nn.Module
    text_encoder: nn.Module
    mm_encoder: nn.Module
    image_to_mm_projection: nn.Module
    text_to_mm_projection: nn.Module
    text_projection: nn.Module
    image_projection: nn.Module

    def encode_image(
        self,
        image: jnp.ndarray,
        image_patches_mask: Optional[jnp.ndarray] = None,
        projection: bool = False,
        deterministic: bool = True,
    ):
        encoded = self.image_encoder(
            image, image_patches_mask=image_patches_mask, deterministic=deterministic
        )
        if projection:
            projected = self.image_projection(encoded.last_hidden_state[:, 0, :])
            return encoded, projected
        return encoded

    def encode_text(
        self,
        text: jnp.ndarray,
        text_mask: Optional[jnp.ndarray] = None,
        projection: bool = False,
        deterministic: bool = True,
    ):
        encoded = self.text_encoder(
            input_ids=text,
            attention_mask=text_mask,
            return_hidden_states=True,
            return_attn_weights=True,
            deterministic=deterministic,
        )
        if projection:
            projected = self.text_projection(encoded.last_hidden_state[:, 0, :])
            return encoded, projected
        return encoded

    def encode_mm(
        self,
        image_embedding: Optional[jnp.ndarray],
        text_embedding: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> TransformerOutput:
        if image_embedding is None or text_embedding is None:
            return TransformerOutput()
        image_embedding = self.image_to_mm_projection(image_embedding)
        text_embedding = self.text_to_mm_projection(text_embedding)
        fused = jnp.concatenate([image_embedding, text_embedding], axis=1)
        return self.mm_encoder(fused, deterministic=deterministic)

    def __call__(
        self,
        image: Optional[jnp.ndarray] = None,
        text: Optional[jnp.ndarray] = None,
        image_patches_mask: Optional[jnp.ndarray] = None,
        text_masked: Optional[jnp.ndarray] = None,
        required_embedding: Optional[str] = None,
        skip_unmasked_mm_encoder: bool = True,
        deterministic: bool = True,
    ) -> FLAVAOutput:
        if required_embedding is None:
            if image is not None and text is not None:
                required_embedding = "mm"
            elif image is not None:
                required_embedding = "image"
            else:
                required_embedding = "text"

        empty = TransformerOutput()
        image_outputs, projected_image = empty, None
        text_outputs, projected_text = empty, None
        image_masked_outputs, text_masked_outputs = empty, empty

        if image is not None and required_embedding in ("image", "mm"):
            image_outputs, projected_image = self.encode_image(
                image, projection=True, deterministic=deterministic
            )
            image_masked_outputs = self.encode_image(
                image, image_patches_mask=image_patches_mask,
                deterministic=deterministic,
            )
        if text is not None and required_embedding in ("text", "mm"):
            text_outputs, projected_text = self.encode_text(
                text, projection=True, deterministic=deterministic
            )
        if text_masked is not None and required_embedding in ("text", "mm"):
            text_masked_outputs = self.encode_text(
                text_masked, deterministic=deterministic
            )

        multimodal_outputs = TransformerOutput()
        multimodal_masked_outputs = TransformerOutput()
        if required_embedding == "mm":
            if not skip_unmasked_mm_encoder:
                multimodal_outputs = self.encode_mm(
                    image_outputs.hidden_states[-1] if image_outputs.hidden_states else None,
                    text_outputs.hidden_states[-1] if text_outputs.hidden_states else None,
                    deterministic=deterministic,
                )
            multimodal_masked_outputs = self.encode_mm(
                image_masked_outputs.hidden_states[-1]
                if image_masked_outputs.hidden_states else None,
                text_masked_outputs.hidden_states[-1]
                if text_masked_outputs.hidden_states else None,
                deterministic=deterministic,
            )

        return FLAVAOutput(
            image=image_outputs,
            image_masked=image_masked_outputs,
            text=text_outputs,
            text_masked=text_masked_outputs,
            multimodal=multimodal_outputs,
            multimodal_masked=multimodal_masked_outputs,
            projected_image_embeddings=projected_image,
            projected_text_embeddings=projected_text,
        )


class FLAVAForPreTraining(nn.Module):
    model: FLAVAModel
    image_codebook: nn.Module
    loss: FLAVAPretrainingLoss

    def encode_image(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.model.encode_image(image, projection=True)[1]

    def encode_text(self, text: jnp.ndarray, text_mask=None) -> jnp.ndarray:
        return self.model.encode_text(text, text_mask, projection=True)[1]

    def __call__(
        self,
        image: Optional[jnp.ndarray] = None,
        text: Optional[jnp.ndarray] = None,
        image_for_codebook: Optional[jnp.ndarray] = None,
        image_patches_mask: Optional[jnp.ndarray] = None,
        text_masked: Optional[jnp.ndarray] = None,
        required_embedding: Optional[str] = None,
        skip_unmasked_mm_encoder: bool = True,
        itm_labels: Optional[jnp.ndarray] = None,
        mlm_labels: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        axis_name: Optional[str] = None,
    ) -> FLAVAPretrainingLossOutput:
        image_labels = None
        if image_for_codebook is not None:
            # frozen codebook: labels carry no gradient
            image_labels = jax.lax.stop_gradient(
                self.image_codebook(image_for_codebook)
            ).reshape(image_for_codebook.shape[0], -1)
            flat_mask = image_patches_mask.reshape(image_patches_mask.shape[0], -1).astype(bool)
            image_labels = jnp.where(flat_mask, image_labels, -1)

        flava_output = self.model(
            image=image,
            text=text,
            image_patches_mask=image_patches_mask,
            text_masked=text_masked,
            required_embedding=required_embedding,
            skip_unmasked_mm_encoder=skip_unmasked_mm_encoder,
            deterministic=deterministic,
        )

        return self.loss(
            image_sequence=flava_output.image.last_hidden_state,
            text_sequence=flava_output.text.last_hidden_state,
            image_masked_sequence=flava_output.image_masked.last_hidden_state,
            text_masked_sequence=flava_output.text_masked.last_hidden_state,
            multimodal_sequence=(
                flava_output.multimodal.last_hidden_state
                if not skip_unmasked_mm_encoder
                else None
            ),
            multimodal_masked_sequence=flava_output.multimodal_masked.last_hidden_state,
            itm_labels=itm_labels,
            mim_labels=image_labels,
            mlm_labels=mlm_labels,
            projected_image_embeddings=flava_output.projected_image_embeddings,
            projected_text_embeddings=flava_output.projected_text_embeddings,
            axis_name=axis_name,
        )


class FLAVAForClassification(nn.Module):
    model: FLAVAModel
    classifier: nn.Module
    loss_fn: Optional[Callable] = None

    def __call__(
        self,
        image: Optional[jnp.ndarray] = None,
        text: Optional[jnp.ndarray] = None,
        required_embedding: Optional[str] = None,
        labels: Optional[jnp.ndarray] = None,
        cls_index: int = 0,
        deterministic: bool = True,
    ) -> FLAVAForClassificationOutput:
        flava_output = self.model(
            image=image,
            text=text,
            required_embedding=required_embedding,
            skip_unmasked_mm_encoder=False,
            deterministic=deterministic,
        )
        if required_embedding == "image":
            hidden = flava_output.image.last_hidden_state
        elif required_embedding == "text":
            hidden = flava_output.text.last_hidden_state
        else:
            hidden = flava_output.multimodal.last_hidden_state

        scores = self.classifier(hidden[:, cls_index], deterministic=deterministic)
        loss = None
        if labels is not None:
            fn = self.loss_fn if self.loss_fn is not None else cross_entropy
            loss = fn(scores, labels)
        return FLAVAForClassificationOutput(logits=scores, loss=loss)


def flava_model(
    image_hidden_size: int = 768,
    image_num_attention_heads: int = 12,
    image_num_hidden_layers: int = 12,
    image_dropout: float = 0.0,
    image_intermediate_size: int = 3072,
    image_intermediate_activation: Union[str, Callable] = "gelu",
    image_layer_norm_eps: float = 1e-12,
    use_image_masking: bool = True,
    image_size: int = 224,
    patch_size: int = 16,
    num_channels: int = 3,
    text_hidden_size: int = 768,
    text_num_attention_heads: int = 12,
    text_num_hidden_layers: int = 12,
    text_dropout: float = 0.0,
    text_intermediate_size: int = 3072,
    text_intermediate_activation: Union[str, Callable] = "gelu",
    text_layer_norm_eps: float = 1e-12,
    vocab_size: int = 30522,
    pad_token_id: int = 0,
    type_vocab_size: int = 2,
    max_position_embeddings: int = 512,
    multimodal_hidden_size: int = 768,
    multimodal_num_attention_heads: int = 12,
    multimodal_num_hidden_layers: int = 6,
    multimodal_dropout: float = 0.0,
    multimodal_intermediate_size: int = 3072,
    multimodal_intermediate_activation: Union[str, Callable] = "gelu",
    multimodal_layer_norm_eps: float = 1e-12,
    text_and_image_proj_size: int = 768,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    remat: bool = False,
    # nn.scan layer stacking: one traced/compiled block per tower regardless
    # of depth (depth-independent compile time for the 10B-scale configs);
    # incompatible with MoE interleaving. See TransformerEncoder.scan_layers.
    scan_layers: bool = False,
    # Mixture-of-experts towers (beyond-reference capability): every
    # ``moe_interval``-th layer of the image/text/mm encoders swaps its MLP
    # for a GShard capacity-dispatched MoE routed over ``ep_axis_name``;
    # router aux losses are sown into the ``intermediates`` collection
    # (collect with ``moe_aux_loss``).
    moe_num_experts: Optional[int] = None,
    moe_top_k: int = 2,
    moe_capacity_factor: float = 1.25,
    moe_interval: int = 2,
    ep_axis_name: Optional[str] = None,
    **kwargs: Any,
) -> FLAVAModel:
    moe_kwargs = dict(
        moe_num_experts=moe_num_experts,
        moe_top_k=moe_top_k,
        moe_capacity_factor=moe_capacity_factor,
        moe_interval=moe_interval,
        ep_axis_name=ep_axis_name,
    )
    image_encoder = flava_image_encoder(
        hidden_size=image_hidden_size,
        num_attention_heads=image_num_attention_heads,
        num_hidden_layers=image_num_hidden_layers,
        use_image_masking=use_image_masking,
        dropout=image_dropout,
        intermediate_size=image_intermediate_size,
        intermediate_activation=image_intermediate_activation,
        layer_norm_eps=image_layer_norm_eps,
        image_size=image_size,
        patch_size=patch_size,
        num_channels=num_channels,
        dtype=dtype, param_dtype=param_dtype, remat=remat,
        scan_layers=scan_layers, **moe_kwargs,
    )
    text_encoder = flava_text_encoder(
        hidden_size=text_hidden_size,
        num_attention_heads=text_num_attention_heads,
        num_hidden_layers=text_num_hidden_layers,
        dropout=text_dropout,
        intermediate_size=text_intermediate_size,
        intermediate_activation=text_intermediate_activation,
        layer_norm_eps=text_layer_norm_eps,
        vocab_size=vocab_size,
        pad_token_id=pad_token_id,
        type_vocab_size=type_vocab_size,
        max_position_embeddings=max_position_embeddings,
        dtype=dtype, param_dtype=param_dtype, remat=remat,
        scan_layers=scan_layers, **moe_kwargs,
    )
    mm_encoder = flava_multimodal_encoder(
        hidden_size=multimodal_hidden_size,
        num_attention_heads=multimodal_num_attention_heads,
        num_hidden_layers=multimodal_num_hidden_layers,
        dropout=multimodal_dropout,
        intermediate_size=multimodal_intermediate_size,
        intermediate_activation=multimodal_intermediate_activation,
        layer_norm_eps=multimodal_layer_norm_eps,
        dtype=dtype, param_dtype=param_dtype, remat=remat,
        scan_layers=scan_layers, **moe_kwargs,
    )
    dense = lambda d, name: nn.Dense(d, dtype=dtype, param_dtype=param_dtype, name=name)
    return FLAVAModel(
        image_encoder=image_encoder,
        text_encoder=text_encoder,
        mm_encoder=mm_encoder,
        image_to_mm_projection=dense(multimodal_hidden_size, "image_to_mm_projection"),
        text_to_mm_projection=dense(multimodal_hidden_size, "text_to_mm_projection"),
        text_projection=dense(text_and_image_proj_size, "text_projection"),
        image_projection=dense(text_and_image_proj_size, "image_projection"),
    )


def flava_model_for_pretraining(
    codebook_image_size: int = 112,
    logit_scale_init: float = math.log(1 / 0.07),
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    **flava_model_kwargs: Any,
) -> FLAVAForPreTraining:
    model = flava_model(dtype=dtype, param_dtype=param_dtype, **flava_model_kwargs)
    hidden_size = flava_model_kwargs.get("multimodal_hidden_size", 768)
    losses = FLAVAPretrainingLoss(
        logit_scale_init=logit_scale_init, hidden_size=hidden_size,
        dtype=dtype, param_dtype=param_dtype,
    )
    codebook = DalleVAEEncoder(
        image_size=codebook_image_size, dtype=dtype, param_dtype=param_dtype
    )
    return FLAVAForPreTraining(model=model, image_codebook=codebook, loss=losses)


def flava_model_for_classification(
    num_classes: int,
    classifier_in_dim: int = 768,
    classifier_hidden_sizes: Union[int, Sequence[int]] = 768,
    classifier_dropout: float = 0.5,
    classifier_activation: Union[str, Callable] = "relu",
    classifier_normalization: Optional[Callable] = None,
    loss_fn: Optional[Callable] = None,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    **flava_model_kwargs: Any,
) -> FLAVAForClassification:
    classifier = MLP(
        in_dim=classifier_in_dim,
        out_dim=num_classes,
        hidden_dims=classifier_hidden_sizes,
        dropout=classifier_dropout,
        activation=classifier_activation,
        normalization=classifier_normalization,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    model = flava_model(dtype=dtype, param_dtype=param_dtype, **flava_model_kwargs)
    return FLAVAForClassification(model=model, classifier=classifier, loss_fn=loss_fn)
