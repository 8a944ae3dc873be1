"""ALBEF model with explicit momentum/queue state.

Parity with reference ``models/albef/model.py`` (ALBEFModel:55,
ALBEFModelWithSimilarity:129, _dequeue_and_enqueue:229, _similarity:251,
_neg_embeddings:293, _gather_embeddings:322).

TPU-native state design (SURVEY §7 "stateful training constructs"): the
reference deep-copies modules and mutates them in place; here there is ONE
module architecture and TWO explicit param pytrees (``params``,
``params_m``). Queues are an explicit ``ALBEFQueues`` pytree threaded
through the (pure) forward:

    out, params_m, queues = albef_with_similarity_forward(
        module, params, params_m, queues, batch..., rng)

- EMA: ``utils.common.momentum_update`` (pure tree_map).
- Enqueue: ``dynamic_update_slice`` at the ring pointer (jit-safe since
  batch size is static); cross-device gather via ``axis_name``.
- Hard negatives: ``jax.random.categorical`` over masked similarity rows —
  replaces the reference's per-row host multinomial loop.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.parallel.collectives import (
    BackpropType,
    all_gather_with_backprop_type,
)
from multimodal_tpu.utils.common import momentum_update


class ALBEFOutput(NamedTuple):
    image_embeddings: Optional[jnp.ndarray] = None
    image_embeddings_m: Optional[jnp.ndarray] = None
    text_embeddings: Optional[jnp.ndarray] = None
    text_embeddings_m: Optional[jnp.ndarray] = None
    multimodal_embeddings: Optional[jnp.ndarray] = None
    multimodal_embeddings_m: Optional[jnp.ndarray] = None


class ALBEFSimilarity(NamedTuple):
    sim_i2t: jnp.ndarray
    sim_t2i: jnp.ndarray
    sim_i2t_m: jnp.ndarray
    sim_t2i_m: jnp.ndarray


class ALBEFWithSimilarityOutput(NamedTuple):
    image_embeddings: jnp.ndarray
    text_embeddings: jnp.ndarray
    multimodal_embeddings: jnp.ndarray
    multimodal_embeddings_neg: jnp.ndarray
    similarity: ALBEFSimilarity
    sim_targets: jnp.ndarray


class ALBEFQueues(NamedTuple):
    """Ring buffers of recent momentum features (reference :169-186)."""

    image_queue: jnp.ndarray  # (embed_size, queue_size)
    text_queue: jnp.ndarray   # (embed_size, queue_size)
    idx_queue: jnp.ndarray    # (1, queue_size)
    queue_ptr: jnp.ndarray    # () int32


def init_albef_queues(
    rng: jax.Array, embed_size: int = 256, queue_size: int = 65536,
    mask_token_id: int = -100,
) -> ALBEFQueues:
    r1, r2 = jax.random.split(rng)
    img = jax.random.normal(r1, (embed_size, queue_size))
    txt = jax.random.normal(r2, (embed_size, queue_size))
    norm = lambda q: q / jnp.linalg.norm(q, axis=0, keepdims=True)
    return ALBEFQueues(
        image_queue=norm(img),
        text_queue=norm(txt),
        idx_queue=jnp.full((1, queue_size), mask_token_id, jnp.int32),
        queue_ptr=jnp.zeros((), jnp.int32),
    )


class ALBEFModel(nn.Module):
    """Grad-path ALBEF trio: vision, text, cross-attention multimodal encoder."""

    vision_encoder: nn.Module
    text_encoder: nn.Module
    multimodal_encoder: nn.Module
    momentum: float = 0.995

    def __call__(
        self,
        image: jnp.ndarray,
        text: jnp.ndarray,
        text_atts: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        image_embeds = self.vision_encoder(image, deterministic=deterministic)
        text_out = self.text_encoder(
            input_ids=text, attention_mask=text_atts, deterministic=deterministic
        )
        text_embeds = text_out.last_hidden_state
        multimodal = self.multimodal_encoder(
            hidden_states=text_embeds,
            attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            deterministic=deterministic,
        )
        return image_embeds, text_embeds, multimodal

    def encode_multimodal(
        self,
        text_embeds: jnp.ndarray,
        text_atts: jnp.ndarray,
        image_embeds: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return self.multimodal_encoder(
            hidden_states=text_embeds,
            attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            deterministic=deterministic,
        )


def albef_forward_with_momentum(
    model: ALBEFModel,
    variables: Any,
    variables_m: Any,
    image: jnp.ndarray,
    text: jnp.ndarray,
    text_atts: jnp.ndarray,
    deterministic: bool = False,
    rngs: Optional[dict] = None,
) -> Tuple[ALBEFOutput, Any]:
    """One ALBEF forward: grad path + EMA update + detached momentum path.

    Returns (ALBEFOutput, new momentum variables).
    """
    img, txt, mm = model.apply(
        variables, image, text, text_atts, deterministic=deterministic, rngs=rngs
    )
    new_variables_m = momentum_update(variables, variables_m, model.momentum)
    img_m, txt_m, mm_m = jax.tree_util.tree_map(
        jax.lax.stop_gradient,
        model.apply(new_variables_m, image, text, text_atts, deterministic=True),
    )
    return (
        ALBEFOutput(img, img_m, txt, txt_m, mm, mm_m),
        jax.tree_util.tree_map(jax.lax.stop_gradient, new_variables_m),
    )


class ALBEFModelWithSimilarity(nn.Module):
    """ALBEF + projections + temperature; similarity vs momentum queues.

    Stateless module — queues and momentum params are threaded through
    ``albef_with_similarity_forward``.
    """

    albef_model: ALBEFModel
    vision_proj: nn.Module
    text_proj: nn.Module
    embed_size: int = 256
    queue_size: int = 65536
    mask_token_id: int = -100
    temp: float = 0.07

    def setup(self):
        self.temp_param = self.param(
            "temp", nn.initializers.constant(self.temp), (), jnp.float32
        )

    def project_features(
        self, image_embeds: jnp.ndarray, text_embeds: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        norm = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )
        image_feat = norm(self.vision_proj(image_embeds[:, 0, :]))
        text_feat = norm(self.text_proj(text_embeds[:, 0, :]))
        return image_feat, text_feat

    def temperature(self) -> jnp.ndarray:
        return self.temp_param

    def __call__(
        self,
        image: jnp.ndarray,
        text: jnp.ndarray,
        text_atts: jnp.ndarray,
        deterministic: bool = True,
    ):
        # plain grad-path forward (used at init to materialize all params)
        img, txt, mm = self.albef_model(image, text, text_atts, deterministic)
        feats = self.project_features(img, txt)
        _ = self.temperature()
        return img, txt, mm, feats


def _gather(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    return all_gather_with_backprop_type(x, axis_name, BackpropType.NONE)


def albef_with_similarity_forward(
    module: ALBEFModelWithSimilarity,
    variables: Any,
    variables_m: Any,
    queues: ALBEFQueues,
    image: jnp.ndarray,
    text: jnp.ndarray,
    text_atts: jnp.ndarray,
    idx: jnp.ndarray,
    rng: jax.Array,
    deterministic: bool = False,
    axis_name: Optional[str] = None,
    rngs: Optional[dict] = None,
) -> Tuple[ALBEFWithSimilarityOutput, Any, ALBEFQueues]:
    """Full ALBEF-with-similarity step (reference forward :188-227).

    Returns (output, new momentum variables, new queues).
    """
    model = module.albef_model

    # 1) EMA-update the full momentum tree first (reference ordering:
    #    momentum_update precedes the momentum forward, model.py:105-117)
    new_variables_m = jax.tree_util.tree_map(
        jax.lax.stop_gradient,
        momentum_update(variables, variables_m, model.momentum),
    )

    # 2) grad-path and detached momentum-path forwards (both towers + proj)
    img, txt, mm, (image_feat, text_feat) = module.apply(
        variables, image, text, text_atts, deterministic, rngs=rngs
    )
    albef_out_m = jax.tree_util.tree_map(
        jax.lax.stop_gradient,
        module.apply(new_variables_m, image, text, text_atts, True),
    )
    img_m, txt_m, _mm_m, (image_feat_m, text_feat_m) = albef_out_m
    albef_out = ALBEFOutput(img, img_m, txt, txt_m, mm, _mm_m)

    temp = module.apply(variables, method=type(module).temperature)

    # 3) similarity targets from id matches against the queue
    idx = idx.reshape(-1, 1)
    idx_all = jnp.concatenate([idx.T, queues.idx_queue], axis=1)  # (1, B+Q)
    pos_idx = (idx == idx_all).astype(jnp.float32)
    sim_targets = pos_idx / jnp.sum(pos_idx, axis=1, keepdims=True)

    # 4) similarities vs [momentum feats ; queue]
    image_feat_all = jnp.concatenate([image_feat_m.T, queues.image_queue], axis=1)
    text_feat_all = jnp.concatenate([text_feat_m.T, queues.text_queue], axis=1)
    sim_i2t = image_feat @ text_feat_all / temp
    sim_t2i = text_feat @ image_feat_all / temp
    sim_i2t_m = jax.lax.stop_gradient(image_feat_m @ text_feat_all / temp)
    sim_t2i_m = jax.lax.stop_gradient(text_feat_m @ image_feat_all / temp)
    similarity = ALBEFSimilarity(sim_i2t, sim_t2i, sim_i2t_m, sim_t2i_m)

    # 5) dequeue/enqueue with cross-device gather
    img_feats_g = _gather(image_feat_m, axis_name)
    txt_feats_g = _gather(text_feat_m, axis_name)
    idx_g = _gather(idx, axis_name)
    bsz = img_feats_g.shape[0]
    if module.queue_size % bsz != 0:
        raise ValueError("queue_size should be divisible by batch_size")
    ptr = queues.queue_ptr
    new_queues = ALBEFQueues(
        image_queue=jax.lax.dynamic_update_slice(
            queues.image_queue, img_feats_g.T, (0, ptr)
        ),
        text_queue=jax.lax.dynamic_update_slice(
            queues.text_queue, txt_feats_g.T, (0, ptr)
        ),
        idx_queue=jax.lax.dynamic_update_slice(
            queues.idx_queue, idx_g.T.astype(queues.idx_queue.dtype), (0, ptr)
        ),
        queue_ptr=(ptr + bsz) % module.queue_size,
    )

    # 6) in-batch hard negatives by categorical sampling over similarity rows
    bs = image.shape[0]
    neg_inf = jnp.finfo(jnp.float32).min
    diag = jnp.eye(bs, dtype=bool)
    w_i2t = jnp.where(diag, neg_inf, sim_i2t[:, :bs])
    w_t2i = jnp.where(diag, neg_inf, sim_t2i[:, :bs])
    rng_i, rng_t = jax.random.split(rng)
    neg_img_idx = jax.random.categorical(rng_i, jax.lax.stop_gradient(w_t2i), axis=1)
    neg_txt_idx = jax.random.categorical(rng_t, jax.lax.stop_gradient(w_i2t), axis=1)
    image_embeds_neg = albef_out.image_embeddings[neg_img_idx]
    text_embeds_neg = albef_out.text_embeddings[neg_txt_idx]
    text_atts_neg = text_atts[neg_txt_idx]

    # 7) negative-pair multimodal pass: (pos text, neg image) + (neg text, pos image)
    mm_neg = model.apply(
        {"params": variables["params"]["albef_model"]},
        jnp.concatenate([albef_out.text_embeddings, text_embeds_neg], axis=0),
        jnp.concatenate([text_atts, text_atts_neg], axis=0),
        jnp.concatenate([image_embeds_neg, albef_out.image_embeddings], axis=0),
        deterministic,
        method=ALBEFModel.encode_multimodal,
    )

    out = ALBEFWithSimilarityOutput(
        image_embeddings=albef_out.image_embeddings,
        text_embeddings=albef_out.text_embeddings,
        multimodal_embeddings=albef_out.multimodal_embeddings,
        multimodal_embeddings_neg=mm_neg,
        similarity=similarity,
        sim_targets=sim_targets,
    )
    return out, new_variables_m, new_queues
