"""Transform+encode p50 latency (BASELINE.json tracked metric).

Single batch: uint8 image -> fused on-device preprocess -> CLIP ViT-B/32
image encoder, plus tokenized text -> text encoder. Reports p50/p90 over 20
runs with distinct inputs (remote runtimes cache identical executions).
Run from the repo root with default env (axon quirks — see verify skill).
NOTE: pass params as jit ARGUMENTS — closing over them serializes the whole
param tree into the compile request (HTTP 413 on the axon tunnel).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.models.clip.model import clip_vit_b32
from multimodal_tpu.ops.image import fused_preprocess_for_encoder

B = 32
model = clip_vit_b32(dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randint(0, 256, (B, 256, 256, 3), np.uint8))
text = jnp.asarray(rng.randint(1, 49000, (B, 77), np.int32))
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
    jnp.zeros((1, 77), jnp.int32),
)


@jax.jit
def step(params, raw_images, text):
    pixels = fused_preprocess_for_encoder(raw_images, 224, dtype=jnp.bfloat16)
    return model.apply(params, pixels, text)


out = step(params, imgs, text); jax.block_until_ready(out)  # compile
lat = []
for i in range(20):
    im_i = jnp.asarray(rng.randint(0, 256, (B, 256, 256, 3), np.uint8))
    tx_i = jnp.asarray(rng.randint(1, 49000, (B, 77), np.int32))
    jax.block_until_ready((im_i, tx_i))
    t0 = time.perf_counter()
    out = step(params, im_i, tx_i)
    float(out.embeddings_a.sum())
    lat.append((time.perf_counter() - t0) * 1e3)
lat.sort()
print(f"transform+encode batch={B}: p50 {lat[len(lat)//2]:.2f} ms, "
      f"p90 {lat[int(len(lat)*0.9)]:.2f} ms, per-pair p50 "
      f"{lat[len(lat)//2]/B:.3f} ms", flush=True)
