"""Drive the Pallas flash-attention backward on the real TPU chip.

Checks: (1) Mosaic-compiles, (2) grads match the XLA path at a moderate
sequence, (3) training-mode flash at 8k sequence runs — the buffer the
round-1 backward would have needed at 8192 seq (fp32 logits) is 8 GiB/head,
which did not fit; the blockwise backward needs only O(S*D).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.ops.flash_attention import _xla_attention, flash_attention


def main():
    # the XLA reference path would otherwise run its einsums at bf16
    # precision on TPU, polluting the comparison
    jax.config.update("jax_default_matmul_precision", "highest")
    print("backend:", jax.default_backend())

    # --- correctness at 512 seq vs XLA ---
    rng = np.random.RandomState(0)
    shape_q = (2, 4, 512, 64)
    q = jnp.asarray(rng.randn(*shape_q).astype(np.float32))
    k = jnp.asarray(rng.randn(*shape_q).astype(np.float32))
    v = jnp.asarray(rng.randn(*shape_q).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True, None) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, True, None) ** 2)

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        print(f"{name}: rel-max-err {err:.2e}")
        assert err < 2e-3, name

    # --- 8k-seq causal training step (bf16) ---
    s = 8192
    qb = jnp.asarray(rng.randn(1, 8, s, 128).astype(np.float32), jnp.bfloat16)

    grad_fn = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
    out = grad_fn(qb, qb, qb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = grad_fn(qb + jnp.bfloat16(1e-3), qb, qb)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    # fwd (2) + bwd (~5 matmul passes) * 2*S^2*D flops per bh
    flops = 7 * 2 * s * s * 128 * 8
    print(f"8k-seq fwd+bwd step: {dt*1e3:.1f} ms, ~{flops/dt/1e12:.1f} TFLOP/s")
    print("ok")


if __name__ == "__main__":
    main()
