"""Real-chip drive: fused_mlp forward+backward at CLIP tower shapes.

Checks (1) the Pallas backward compiles and runs on the TPU, (2) grads match
the XLA-vjp fallback path numerically at bf16, (3) per-call timing of the
train-relevant fwd+bwd for the vision/text MLP shapes.

Run from /root/repo with default env (axon): python scripts/drive_mlp_bwd.py
"""

import os
import sys
import time

os.environ.setdefault("MMTPU_FUSED_MLP_BWD", "1")  # drive the opt-in kernels
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.ops.fused_encoder import _mlp_bwd_pallas, _mlp_xla, fused_mlp


def drive(rows, din, dff, act, label):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(rows, din) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(r.randn(din, dff) * 0.03, jnp.bfloat16)
    b1 = jnp.asarray(r.randn(dff) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(r.randn(dff, din) * 0.03, jnp.bfloat16)
    b2 = jnp.asarray(r.randn(din) * 0.01, jnp.bfloat16)

    def loss_fused(*a):
        return jnp.sum(fused_mlp(*a, act).astype(jnp.float32) ** 2)

    def loss_xla(*a):
        return jnp.sum(_mlp_xla(*a, act).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
    out_f = jax.tree_util.tree_map(np.asarray, gf(x, w1, b1, w2, b2))
    out_x = jax.tree_util.tree_map(np.asarray, gx(x, w1, b1, w2, b2))
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), out_f, out_x):
        a32, b32 = a.astype(np.float32), b.astype(np.float32)
        denom = max(np.abs(b32).max(), 1e-6)
        rel = np.abs(a32 - b32).max() / denom
        assert rel < 5e-2, f"{label} {name}: max rel err {rel}"
    # staged kernel really engages?
    staged = _mlp_bwd_pallas(x, jnp.ones((rows, din), jnp.bfloat16), w1, b1, w2, act)
    assert staged is not None, f"{label}: kernel did not engage"

    # chained timing (distinct inputs per call, one host pull)
    @jax.jit
    def step(x, carry):
        xs = x + carry.astype(x.dtype) * 0
        g = jax.grad(loss_fused, argnums=0)(xs, w1, b1, w2, b2)
        return jnp.sum(g.astype(jnp.float32))

    c = step(x, jnp.float32(0))
    float(c)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        c = step(x, c)
    float(c)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: grads ok; fwd+bwd {dt:.2f} ms/call")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    drive(256 * 50, 768, 3072, "quick_gelu", "clip-vision b256")
    drive(256 * 77, 512, 2048, "quick_gelu", "clip-text b256")
    drive(32 * 197, 768, 3072, "gelu_exact", "flava-image b32")
    print("drive_mlp_bwd: all ok")
