"""Benchmark: CLIP ViT-B/32 inference throughput on the real TPU chip.

Measures image-text pairs/sec/chip in bf16 through the full public path
(fused on-device uint8 preprocessing + both encoders) against the driver
target of 5,000 pairs/sec/chip (BASELINE.json). Prints ONE JSON line.

Methodology: steps are data-dependency chained (each step's text input
depends on the previous step's output) with a single host pull at the end —
this defeats result caching / early-ack in remote runtimes while amortizing
host-tunnel round-trip latency, so the number reflects on-chip throughput.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.models.clip.model import clip_vit_b32
from multimodal_tpu.ops.image import fused_preprocess_for_encoder

TARGET = 5000.0  # pairs/sec/chip on v5e
BATCH = int(os.environ.get("BENCH_BATCH", 512))
STEPS = int(os.environ.get("BENCH_STEPS", 30))


def main():
    model = clip_vit_b32(dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(BATCH, 256, 256, 3), dtype=np.uint8)
    )
    text = jnp.asarray(rng.randint(1, 49405, size=(BATCH, 77), dtype=np.int32))

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
        jnp.zeros((1, 77), jnp.int32),
    )

    @jax.jit
    def forward_chained(params, images_u8, text, carry):
        text = text + (carry * 0).astype(jnp.int32)
        pixels = fused_preprocess_for_encoder(images_u8, 224, dtype=jnp.bfloat16)
        out = model.apply(params, pixels, text)
        return jnp.sum(out.embeddings_a).astype(jnp.float32)

    # warmup / compile
    float(forward_chained(params, images_u8, text, jnp.float32(0)))

    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(STEPS):
        carry = forward_chained(params, images_u8, text, carry)
    float(carry)  # single host pull closes the chain
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "clip_vit_b32_inference_throughput",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
