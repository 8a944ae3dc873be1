"""Flash-kernel block-size sweep vs fused-XLA attention (fwd and fwd+bwd).

Methodology fixes over the round-2 bench (which re-timed identical calls —
served from the remote runtime's result cache — and folded tunnel RTT into
single measurements): every timed call perturbs its inputs, work is chained
inside one jitted program (20 steps), and the timing is per-step after a
warm-up call, so the number is on-chip throughput.

Run: python scripts/bench_flash_sweep.py [--seqs 2048,4096,8192] [--bwd]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimodal_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)


def xla_attention(q, k, v, causal=True):
    s = q.shape[-2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (q.shape[-1] ** 0.5)
    if causal:
        logits = jnp.where(jnp.tril(jnp.ones((s, s), bool)), logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def bench(make_step, q, k, v, steps=20):
    @jax.jit
    def chained(q, k, v, seed):
        out = q + seed * 1e-6  # perturb: defeats remote result caching
        for _ in range(steps):
            out = make_step(out, k, v)
        return jnp.sum(out.astype(jnp.float32))

    float(chained(q, k, v, jnp.bfloat16(0)))  # compile + warm
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chained(q, k, v, jnp.bfloat16(i + 1)))
        times.append((time.perf_counter() - t0) / steps)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="2048,4096")
    ap.add_argument("--blocks", default="256,512,1024")
    ap.add_argument("--bwd", action="store_true")
    args = ap.parse_args()

    causal = True
    for s in (int(x) for x in args.seqs.split(",")):
        b, h, d = (4, 16, 64) if s <= 4096 else (1, 8, 64)
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
                   for kk in jax.random.split(key, 3))
        flops = 4 * b * h * s * s * d * 0.5

        t_xla = bench(lambda q, k, v: xla_attention(q, k, v, causal), q, k, v)
        print(f"seq={s}: xla {t_xla*1e3:6.2f} ms ({flops/t_xla/1e12:5.1f} TF/s)",
              flush=True)
        for blk in (int(x) for x in args.blocks.split(",")):
            fwd = functools.partial(
                flash_attention_forward, causal=causal,
                block_q=blk, block_k=blk,
            )
            t = bench(lambda q, k, v: fwd(q, k, v), q, k, v)
            print(f"         flash bq=bk={blk:5d} {t*1e3:6.2f} ms "
                  f"({flops/t/1e12:5.1f} TF/s)  {t_xla/t:4.2f}x vs xla",
                  flush=True)

        if args.bwd:
            gw = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.bfloat16)

            def fa_vjp(qq, kk_, vv):
                g = jax.grad(lambda a: jnp.sum(
                    (flash_attention(a, kk_, vv, None, causal) * gw
                     ).astype(jnp.float32)))(qq)
                return g

            def xla_vjp(qq, kk_, vv):
                return jax.grad(lambda a: jnp.sum(
                    (xla_attention(a, kk_, vv, causal) * gw
                     ).astype(jnp.float32)))(qq)

            t_fb = bench(fa_vjp, q, k, v, steps=10)
            t_xb = bench(xla_vjp, q, k, v, steps=10)
            print(f"         fwd+bwd: flash {t_fb*1e3:6.2f} ms | "
                  f"xla {t_xb*1e3:6.2f} ms | {t_xb/t_fb:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
