#!/usr/bin/env python
"""Compile-and-run every model family on the real TPU chip (small configs)."""
import sys, time; import os; _r = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _r); sys.path.insert(0, os.path.join(_r, "tests"))
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend())
results = {}

def check(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        results[name] = f"OK ({time.time()-t0:.0f}s)"
    except Exception as e:
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
    print(name, "->", results[name], flush=True)

r = np.random.RandomState(0)
key = jax.random.PRNGKey(0)

# FLAVA pretraining forward
def flava():
    from tests.models.test_flava import SMALL
    from multimodal_tpu.models.flava.model import flava_model_for_pretraining
    m = flava_model_for_pretraining(codebook_image_size=32, **SMALL)
    img = jnp.asarray(r.rand(2,32,32,3).astype(np.float32))
    txt = jnp.asarray(r.randint(1,99,(2,8),dtype=np.int32))
    kw = dict(image=img, text=txt, image_for_codebook=img,
              image_patches_mask=jnp.ones((2,16)), text_masked=txt,
              itm_labels=jnp.asarray([1,0]), mlm_labels=txt)
    p = m.init(key, **kw)
    return jax.jit(lambda p: m.apply(p, **kw).losses.total())(p)
check("flava_pretrain", flava)

# CoCa
def coca():
    from tests.models.test_coca import SMALL
    from multimodal_tpu.models.coca.coca_model import CoCaForPretraining, coca_vit
    m = CoCaForPretraining(coca_vit(**SMALL))
    img = jnp.asarray(r.rand(2,16,16,3).astype(np.float32))
    txt = jnp.asarray(r.randint(1,49,(2,12),dtype=np.int32))
    p = m.init(key, img, txt)
    out = jax.jit(lambda p: m.apply(p, img, txt))(p)
    return out["contrastive"] + out["captioning"]
check("coca", coca)

# BLIP2
def blip2():
    from tests.models.test_blip2 import build_blip2
    m = build_blip2()
    img = jnp.asarray(r.rand(2,16,16,3).astype(np.float32))
    ids = jnp.asarray(r.randint(1,48,(2,6),dtype=np.int32))
    mask = jnp.ones((2,6),jnp.int32)
    p = m.init(key, img, ids, mask)
    return jax.jit(lambda p: m.apply(p, img, ids, mask).prediction_scores)(p)
check("blip2", blip2)

# MDETR
def mdetr():
    from tests.models.test_mdetr import TINY
    from multimodal_tpu.models.mdetr.model import mdetr_resnet101, pad_images, pad_text
    m = mdetr_resnet101(**TINY)
    images, im = pad_images([r.rand(64,64,3).astype(np.float32)]*2)
    text, tm = pad_text([r.randint(2,99,7), r.randint(2,99,5)])
    args = (jnp.asarray(images), jnp.asarray(im), jnp.asarray(text), jnp.asarray(tm))
    p = m.init(key, *args)
    return jax.jit(lambda p: m.apply(p, *args).pred_boxes)(p)
check("mdetr", mdetr)

# MAE
def mae():
    from tests.models.test_mae import small_image_mae
    m = small_image_mae()
    x = jnp.asarray(r.rand(2,32,32,3).astype(np.float32))
    p = m.init({"params": key, "patch_drop": jax.random.PRNGKey(1)}, x, deterministic=False)
    return jax.jit(lambda p: m.apply(p, x, deterministic=False,
        rngs={"patch_drop": jax.random.PRNGKey(2)}).decoder_pred)(p)
check("mae", mae)

# VideoGPT VQVAE roundtrip
def vqvae():
    from multimodal_tpu.models.video_gpt.model import video_vqvae
    m = video_vqvae(encoder_hidden_dim=16, n_res_layers=1, attn_hidden_dim=16,
                    num_embeddings=32, embedding_dim=8, decoder_hidden_dim=16)
    v = jnp.asarray(r.rand(1,4,8,8,3).astype(np.float32))
    vs = m.init({"params": key, "vq": jax.random.PRNGKey(1)}, v, deterministic=False)
    return jax.jit(lambda vs: m.apply(vs, v).decoded)(vs)
check("video_vqvae", vqvae)

# Swin3D / Omnivore
def omni():
    from multimodal_tpu.models.omnivore import _omnivore
    m = _omnivore(16, (1,1), (2,4))
    v = jnp.ones((1,4,16,16,3))
    p = m.init(key, jnp.ones((1,1,16,16,4)), "rgbd")
    return jax.jit(lambda p: m.apply(p, v, "video"))(p)
check("omnivore", omni)

# Diffusion DDPM sampling
def ddpm():
    import numpy as np
    from multimodal_tpu.diffusion_labs.models.dalle2_decoder import dalle2_decoder
    dec = dalle2_decoder(timesteps=10, guidance=2.0, clip_embed_dim=8,
        channels_per_layer=(8,16), dim_res_cond=16, eval_steps=np.array([0,5,9]),
        num_resize=1, num_res_per_layer=1, use_attention_for_layer=(False,True),
        embed_dim=8, num_heads=2)
    x = jnp.ones((1,8,8,3)); t = jnp.asarray([1])
    cond = {"clip_image": jnp.ones((1,8))}
    vs = dec.init({"params": key, "diffusion": jax.random.PRNGKey(1),
                   "cfguidance": jax.random.PRNGKey(2)}, x, t, cond, deterministic=False)
    return dec.apply(vs, x, conditional_inputs=cond, rngs={"diffusion": jax.random.PRNGKey(3)})
check("ddpm_sampling", ddpm)

print("\nsummary:")
for k, v in results.items():
    print(f"  {k}: {v}")
fails = [k for k, v in results.items() if v.startswith("FAIL")]
sys.exit(1 if fails else 0)
