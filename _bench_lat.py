"""Transform+encode p50 latency (BASELINE.json tracked metric).

Single batch: uint8 image -> fused on-device preprocess -> CLIP ViT-B/32
image encoder, plus tokenized text -> text encoder. Reports p50/p90 over 20
runs with distinct inputs (remote runtimes cache identical executions).
Run from the repo root with default env (axon quirks — see verify skill).
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
params = model.init(jax.random.PRNGKey(0),
                    fused_preprocess_for_encoder(imgs), text)

# two jitted stages: the axon tunnel rejects the single fused graph
# (HTTP 413 on remote_compile), so dispatch preprocess + encode separately —
# still one host round-trip of latency per stage
encode = jax.jit(lambda pixels, text: model.apply(params, pixels, text))

def step(raw_images, text):
    return encode(fused_preprocess_for_encoder(raw_images), text)

out = step(imgs, text); jax.block_until_ready(out)  # compile
lat = []
for i in range(20):
    im_i = jnp.asarray(rng.randint(0, 256, (B, 256, 256, 3), np.uint8))
    tx_i = jnp.asarray(rng.randint(1, 49000, (B, 77), np.int32))
    jax.block_until_ready((im_i, tx_i))
    t0 = time.perf_counter()
    out = step(im_i, tx_i)
    float(out.embeddings_a.sum())
    lat.append((time.perf_counter() - t0) * 1e3)
lat.sort()
print(f"transform+encode batch={B}: p50 {lat[len(lat)//2]:.2f} ms, "
      f"p90 {lat[int(len(lat)*0.9)]:.2f} ms, per-pair p50 "
      f"{lat[len(lat)//2]/B:.3f} ms", flush=True)
