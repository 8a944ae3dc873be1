"""Serving benchmark: autoregressive KV-cache decode throughput on the TPU.

Measures MUGEN text->video MultimodalGPT generation (the reference's
`GenerationUtil.sample` path, utils/generate.py:32) at the real config:
128 text tokens prime -> 512 video tokens sampled through the fixed-cache
`lax.scan` decoder, then VQ-VAE decode to pixels. Reports decode tokens/sec
(batch x sampled tokens / wall) with the prime+scan compiled once.

Usage: python scripts/bench_decode.py [--batch 8] [--tokens 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.examples.mugen.text_video_gpt import text_video_gpt
from multimodal_tpu.utils.generate import GenerationUtil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    model = text_video_gpt(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(0, 49408, size=(args.batch, 128), dtype=np.int32))

    video_probe = jnp.zeros((1, 32, 256, 256, 3), jnp.bfloat16)
    text_probe = text[:1]
    out_probe = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        video_probe, video_probe, text_probe, out_probe,
        method=type(model).init_weights,
    )

    def sample_tokens(variables, text, key, carry):
        # construct inside the traced fn so params ride as jit arguments,
        # not as serialized constants (HTTP 413 under the axon tunnel);
        # carry chains successive calls so the remote runtime cannot
        # early-ack or cache (each call's text depends on the last output)
        text = text + (carry * 0).astype(jnp.int32)
        gen = GenerationUtil(model, variables)
        tokens = gen.sample(text, max_seq_len=args.tokens, rng=key, top_k=100).tokens
        return jnp.sum(tokens).astype(jnp.float32)

    fn = jax.jit(sample_tokens)
    float(fn(variables, text, jax.random.PRNGKey(2), jnp.float32(0)))  # compile

    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for i in range(args.steps):
        carry = fn(variables, text, jax.random.PRNGKey(3 + i), carry)
    float(carry)  # single host pull closes the chain
    dt = (time.perf_counter() - t0) / args.steps

    total_tokens = args.batch * args.tokens
    print(
        f"decode: batch={args.batch} tokens={args.tokens} "
        f"{dt * 1e3:.1f} ms/gen  {total_tokens / dt:.0f} tokens/sec  "
        f"{dt * 1e3 / args.tokens:.2f} ms/token-step"
    )


if __name__ == "__main__":
    main()
