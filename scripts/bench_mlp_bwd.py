"""A/B microbench: fused_mlp backward — Pallas staged kernel vs the
XLA-recompute VJP it replaced — at the CLIP vision train shape.

Chained timing (inputs perturbed per call, one host pull) on the real chip.
Run: python scripts/bench_mlp_bwd.py [rows] [din] [dff]
"""

import functools
import os
import sys
import time

os.environ.setdefault("MMTPU_FUSED_MLP_BWD", "1")  # A/B needs the opt-in side
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import multimodal_tpu.ops.fused_encoder as fe


def make_old_path():
    @functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
    def old(x, w1, b1, w2, b2, activation="gelu"):
        return fe._mlp_impl(x, w1, b1, w2, b2, activation)

    def fwd(x, w1, b1, w2, b2, activation):
        return fe._mlp_impl(x, w1, b1, w2, b2, activation), (x, w1, b1, w2, b2)

    def bwd(activation, res, g):
        x, w1, b1, w2, b2 = res
        _, vjp = jax.vjp(lambda *a: fe._mlp_xla(*a, activation), x, w1, b1, w2, b2)
        return vjp(g)

    old.defvjp(fwd, bwd)
    return old


def time_grad(fn, label, rows, din, dff, act="quick_gelu", n=30):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(rows, din) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(r.randn(din, dff) * 0.03, jnp.bfloat16)
    b1 = jnp.asarray(r.randn(dff) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(r.randn(dff, din) * 0.03, jnp.bfloat16)
    b2 = jnp.asarray(r.randn(din) * 0.01, jnp.bfloat16)

    @jax.jit
    def step(x, w1, carry):
        xs = x + carry.astype(x.dtype) * 0
        loss = lambda *a: jnp.sum(fn(*a, "quick_gelu").astype(jnp.float32) ** 2)
        gx, gw1, gw2 = jax.grad(loss, argnums=(0, 1, 3))(xs, w1, b1, w2, b2)
        return (jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw1.astype(jnp.float32))
                + jnp.sum(gw2.astype(jnp.float32)))

    c = step(x, w1, jnp.float32(0))
    float(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = step(x, w1, c)
    float(c)
    dt = (time.perf_counter() - t0) / n * 1e3
    flops = 3 * (2 * rows * din * dff * 2)  # fwd 2 GEMMs, bwd ~2x
    print(f"{label}: {dt:.2f} ms  (~{flops/dt/1e9:.0f} TF/s incl. recompute)")
    return dt


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256 * 50
    din = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    dff = int(sys.argv[3]) if len(sys.argv) > 3 else 3072
    print("backend:", jax.default_backend(), f"rows={rows} din={din} dff={dff}")
    old = make_old_path()
    t_old = time_grad(old, "xla-recompute bwd", rows, din, dff)
    t_new = time_grad(fe.fused_mlp, "pallas staged bwd", rows, din, dff)
    print(f"speedup: {t_old / t_new:.2f}x")
