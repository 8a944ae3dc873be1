#!/usr/bin/env python
"""PRODUCTION-shape train-step smoke on the real TPU chip, one per family.

`scripts/tpu_smoke.py` compiles every family at toy dims; this drives each
at realistic production dims (base-config towers, real sequence/image
sizes) through a jitted forward+backward, because several lowering bugs
only appear when VMEM budgets force partial blocks at real shapes (e.g.
the round-5 key-bias BlockSpec tiling failure that blocked FLAVA-900m at
batch 64). CLIP/FLAVA/long-context are exercised at production shape by
bench.py / bench_flava_train.py already; this covers the rest.

Loss = scalar reduction of the model outputs (lowering coverage, not loss
plumbing — the real objectives are parity-tested on the CPU mesh).

Run: python scripts/tpu_prod_smoke.py [family ...]   (default: all)
"""

import os
import sys
import time

_r = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _r)

import jax
import jax.numpy as jnp
import numpy as np

r = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
results = {}


def check(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        results[name] = f"OK ({time.time() - t0:.0f}s)"
    except Exception as e:  # noqa: BLE001 — summary table
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
    print(name, "->", results[name], flush=True)


def _grad_scalar(model, params, *args, **kwargs):
    def loss(p):
        out = model.apply(p, *args, **kwargs)
        leaves = [
            l for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        ]
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)

    g = jax.jit(jax.grad(loss))(params)
    return jax.tree_util.tree_leaves(g)[0]


def coca():
    from multimodal_tpu.models.coca.coca_model import coca_vit_b_32

    m = coca_vit_b_32()
    img = jnp.asarray(r.rand(8, 224, 224, 3), jnp.float32)
    txt = jnp.asarray(r.randint(1, 49000, (8, 77)), jnp.int32)
    p = jax.jit(m.init)(key, img, txt)
    return _grad_scalar(m, p, img, txt)


def image_mae():
    from multimodal_tpu.models.masked_auto_encoder.model import image_mae

    m = image_mae()  # ViT-B/16 encoder + 8-layer decoder defaults
    x = jnp.asarray(r.rand(16, 224, 224, 3), jnp.float32)
    p = m.init({"params": key, "masking": jax.random.PRNGKey(1)}, x)

    def loss(p):
        out = m.apply(p, x, rngs={"masking": jax.random.PRNGKey(2)})
        leaves = [
            l for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        ]
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)

    g = jax.jit(jax.grad(loss))(p)
    return jax.tree_util.tree_leaves(g)[0]


def audio_mae():
    from multimodal_tpu.models.masked_auto_encoder.model import (
        vit_b_16_audio_mae,
    )

    m = vit_b_16_audio_mae()
    x = jnp.asarray(r.rand(4, 1024, 128, 1), jnp.float32)
    p = m.init({"params": key, "masking": jax.random.PRNGKey(1)}, x)

    def loss(p):
        out = m.apply(p, x, rngs={"masking": jax.random.PRNGKey(2)})
        leaves = [
            l for l in jax.tree_util.tree_leaves(out)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        ]
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)

    g = jax.jit(jax.grad(loss))(p)
    return jax.tree_util.tree_leaves(g)[0]


def blip2():
    from multimodal_tpu.models.blip2.blip2 import BLIP2
    from multimodal_tpu.models.blip2.qformer_model import QformerForCLM
    from multimodal_tpu.modules.encoders.vision_transformer import (
        vision_transformer,
    )

    # the full-scale dims from tests/models/test_blip2_fullscale_parity.py
    m = BLIP2(
        qformer=QformerForCLM(
            dim_q=768, dim_kv=768, dim_feedforward=3072, num_heads=12,
            attn_dropout=0.0, dropout=0.0, num_hidden_layers=12,
            max_position_embeddings=512, vocab_size=30522, query_length=32,
        ),
        vision_encoder=vision_transformer(
            patch_size=16, hidden_dim=768, dim_feedforward=3072, n_layer=12,
            n_head=12, image_size=224, include_cls_embed=True,
            final_layer_norm_eps=1e-5,
        ),
        dim_q=768, image_encoder_embedding_dim=768, embedding_dim=256,
        num_query_token=32, decoder_bos_token_id=101,
    )
    img = jnp.asarray(r.rand(4, 224, 224, 3), jnp.float32)
    ids = jnp.asarray(r.randint(103, 30522, (4, 24)), jnp.int32)
    mask = jnp.ones((4, 24), jnp.int32)
    p = jax.jit(m.init)(key, img, ids, mask)
    return _grad_scalar(m, p, img, ids, mask)


def albef():
    from multimodal_tpu.models.albef.image_encoder import ALBEFVisionEncoder
    from multimodal_tpu.models.albef.model import ALBEFModel
    from multimodal_tpu.models.albef.multimodal_encoder import (
        ALBEFMultimodalEncoder,
    )
    from multimodal_tpu.models.flava.text_encoder import flava_text_encoder

    m = ALBEFModel(
        ALBEFVisionEncoder(
            image_size=256, patch_size=16, num_hidden_layers=12,
            num_attention_heads=12, hidden_size=768, mlp_dim=3072,
        ),
        flava_text_encoder(
            num_hidden_layers=12, hidden_size=768, num_attention_heads=12,
            intermediate_size=3072, vocab_size=30522,
            max_position_embeddings=512,
        ),
        ALBEFMultimodalEncoder(
            hidden_size=768, num_hidden_layers=6, num_attention_heads=12,
            intermediate_size=3072,
        ),
    )
    img = jnp.asarray(r.rand(8, 256, 256, 3), jnp.float32)
    txt = jnp.asarray(r.randint(1, 30000, (8, 30)), jnp.int32)
    mask = jnp.ones((8, 30), jnp.int32)
    p = jax.jit(m.init)(key, img, txt, mask)
    return _grad_scalar(m, p, img, txt, mask)


def mdetr():
    from multimodal_tpu.models.mdetr.model import mdetr_resnet101

    m = mdetr_resnet101(num_queries=100, num_classes=255)
    img = jnp.asarray(r.rand(2, 384, 384, 3), jnp.float32)
    img_mask = jnp.ones((2, 384, 384), bool)
    txt = jnp.asarray(r.randint(5, 30000, (2, 24)), jnp.int32)
    txt_mask = jnp.ones((2, 24), jnp.int32)
    p = jax.jit(m.init)(key, img, img_mask, txt, txt_mask)
    return _grad_scalar(m, p, img, img_mask, txt, txt_mask)


def omnivore():
    from multimodal_tpu.models.omnivore import omnivore_swin_t

    m = omnivore_swin_t()
    vid = jnp.asarray(r.rand(2, 8, 224, 224, 3), jnp.float32)
    p = m.init(key, vid, "video")

    def loss(p):
        out = m.apply(p, vid, "video")
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(p)
    return jax.tree_util.tree_leaves(g)[0]


def video_vqvae():
    from multimodal_tpu.models.video_gpt.model import video_vqvae as build

    m = build()
    x = jnp.asarray(r.rand(1, 16, 64, 64, 3), jnp.float32)
    variables = m.init(
        {"params": key, "vq": jax.random.PRNGKey(1)}, x
    )

    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(params):
        out, _ = m.apply(
            dict(rest, params=params), x, rngs={"vq": jax.random.PRNGKey(2)},
            mutable=["vq_stats", "batch_stats"],
        )
        return jnp.sum(out.decoded.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    return jax.tree_util.tree_leaves(g)[0]


def adm_unet():
    from multimodal_tpu.diffusion_labs.models.adm_unet import ADMUNet

    m = ADMUNet(dim_attn_cond=None)  # default ADM dims: (128,256,256,256)
    x = jnp.asarray(r.rand(4, 64, 64, 3), jnp.float32)
    t = jnp.asarray(r.randint(0, 1000, (4,)), jnp.int32)
    p = jax.jit(m.init)(key, x, t)
    return _grad_scalar(m, p, x, t)


FAMILIES = {
    "coca_b32": coca,
    "image_mae_b16": image_mae,
    "audio_mae_b16": audio_mae,
    "blip2_fullscale": blip2,
    "albef_base": albef,
    "mdetr_r101": mdetr,
    "omnivore_swin_t": omnivore,
    "video_vqvae": video_vqvae,
    "adm_unet_64": adm_unet,
}

if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    wanted = sys.argv[1:] or list(FAMILIES)
    for name in wanted:
        check(name, FAMILIES[name])
    bad = {k: v for k, v in results.items() if not v.startswith("OK")}
    print("==", len(results) - len(bad), "ok /", len(results), "total")
    sys.exit(1 if bad else 0)
