"""Flash-attention kernel benchmark on TPU: Pallas vs XLA attention.

Chained-step timing (data dependency between iterations, single host pull)
to defeat remote-runtime caching. Run: python scripts/bench_flash.py
"""
import os
import time

import jax
import jax.numpy as jnp

from multimodal_tpu.ops.flash_attention import flash_attention


def xla_attention(q, k, v, causal):
    s = q.shape[-2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (q.shape[-1] ** 0.5)
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def bench(fn, q, k, v, steps=5):
    def chained(q, k, v):
        out = q
        for _ in range(steps):
            out = fn(out, k, v)
        return out

    jitted = jax.jit(chained)
    out = jitted(q, k, v); out.block_until_ready()  # compile
    # time with DIFFERENT inputs so the remote runtime can't serve a cached
    # execution; average two distinct timed calls
    times = []
    for i in (1, 2):
        qi, ki, vi = q + i * 1e-3, k + i * 1e-3, v + i * 1e-3
        qi.block_until_ready(); ki.block_until_ready(); vi.block_until_ready()
        t0 = time.perf_counter()
        out = jitted(qi, ki, vi)
        float(out.sum())
        times.append(time.perf_counter() - t0)
    return min(times) / steps


def main():
    causal = True
    print(f"devices: {jax.devices()}")
    for s in (int(x) for x in os.environ.get("SEQS", "2048,4096").split(",")):
        b, h, d = (4, 16, 64) if s <= 4096 else (1, 8, 64)
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
                   for kk in jax.random.split(key, 3))
        flops = 4 * b * h * s * s * d * (0.5 if causal else 1.0)
        t_flash = bench(lambda q, k, v: flash_attention(q, k, v, causal=causal), q, k, v)
        t_xla = bench(lambda q, k, v: xla_attention(q, k, v, causal), q, k, v)
        print(f"seq={s}: flash {t_flash*1e3:.2f} ms ({flops/t_flash/1e12:.1f} TF/s) | "
              f"xla {t_xla*1e3:.2f} ms ({flops/t_xla/1e12:.1f} TF/s) | "
              f"speedup {t_xla/t_flash:.2f}x", flush=True)


if __name__ == "__main__":
    main()
