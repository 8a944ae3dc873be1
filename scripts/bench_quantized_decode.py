"""Weight-only int8 vs bf16 autoregressive decode on the real chip.

Small-batch decode is weight-read-bound: per token step the chip reads all
parameters plus the KV prefix. int8 weights halve the parameter bytes vs
bf16, so the expected ceiling-level speedup at batch 8 (params >> KV bytes)
approaches 2x and decays as batch (KV traffic) grows.

Run: python scripts/bench_quantized_decode.py [--batch 8] [--steps 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.quantization import (
    QuantizedModule,
    quantize_tree,
    size_bytes,
)
from multimodal_tpu.serving import InferenceEngine, Request


def bench(model, params, batch, steps, max_len, cache_dtype, seed=0,
          decode_steps=8):
    engine = InferenceEngine(
        model, params, n_slots=batch, max_len=max_len,
        cache_dtype=cache_dtype, seed=seed, decode_steps=decode_steps,
    )
    rng = np.random.default_rng(seed)
    prompts = [rng.integers(1, 1000, 32).tolist() for _ in range(batch)]
    # warmup/compile
    for p in prompts:
        engine.submit(Request(p, max_new_tokens=2, temperature=1.0))
    engine.run()
    # timed: all slots decode in lockstep for `steps` ticks
    for p in prompts:
        engine.submit(Request(p, max_new_tokens=steps, temperature=1.0))
    engine.ticks = 0
    t0 = time.perf_counter()
    outs = engine.run()
    dt = time.perf_counter() - t0
    produced = sum(len(o.tokens) for o in outs)
    return produced / dt, dt / engine.ticks * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--n-layer", type=int, default=12)
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--n-head", type=int, default=12)
    p.add_argument("--decode-steps", type=int, default=8)
    args = p.parse_args()

    model = LongContextLM(
        vocab_size=args.vocab, max_seq_len=args.max_len,
        n_layer=args.n_layer, d_model=args.d_model, n_head=args.n_head,
        dim_feedforward=4 * args.d_model, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )
    qparams = quantize_tree(params)
    print(
        f"backend={jax.default_backend()} params bf16="
        f"{size_bytes(params)/1e6:.0f}MB int8={size_bytes(qparams)/1e6:.0f}MB"
    )

    tok_s, ms = bench(
        model, params, args.batch, args.steps, args.max_len, jnp.bfloat16,
        decode_steps=args.decode_steps,
    )
    print(f"bf16 weights, bf16 kv : {tok_s:8.0f} tok/s  {ms:6.2f} ms/tick")
    qtok_s, qms = bench(
        QuantizedModule(model), qparams, args.batch, args.steps,
        args.max_len, jnp.bfloat16, decode_steps=args.decode_steps,
    )
    print(f"int8 weights, bf16 kv : {qtok_s:8.0f} tok/s  {qms:6.2f} ms/tick"
          f"  ({qtok_s/tok_s:.2f}x)")
    ktok_s, kms = bench(
        model, params, args.batch, args.steps, args.max_len, "int8",
        decode_steps=args.decode_steps,
    )
    print(f"bf16 weights, int8 kv : {ktok_s:8.0f} tok/s  {kms:6.2f} ms/tick"
          f"  ({ktok_s/tok_s:.2f}x)")
    btok_s, bms = bench(
        QuantizedModule(model), qparams, args.batch, args.steps,
        args.max_len, "int8", decode_steps=args.decode_steps,
    )
    print(f"int8 weights, int8 kv : {btok_s:8.0f} tok/s  {bms:6.2f} ms/tick"
          f"  ({btok_s/tok_s:.2f}x)")


if __name__ == "__main__":
    main()
