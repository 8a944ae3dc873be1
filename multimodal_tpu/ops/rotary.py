"""Rotary position embeddings (RoPE).

No reference counterpart (the reference uses learned/sinusoidal absolute
embeddings everywhere); RoPE is what makes UNBOUNDED-position serving
possible — the engine's sliding-window streaming mode
(``serving/engine.py`` ``window=``) feeds ever-growing position ids, and
rotation encodes only RELATIVE offsets into q·k, so cached keys stay
valid forever: k rotated at write by its own position, q rotated at read
by its position, and the dot product sees the angle difference.

Applied per head after the head split, fp32 math (angles at bf16
resolution alias quickly), NeoX-style half rotation.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_rotary(
    x: jnp.ndarray, positions: jnp.ndarray, theta: float = 10000.0
) -> jnp.ndarray:
    """Rotate ``x`` (b, h, s, d) by per-token ``positions`` (b, s) or (s,).

    Pairs dimension i with i + d/2 (rotate-half layout); d must be even.
    """
    b, h, s, d = x.shape
    if d % 2:
        raise ValueError(f"rotary head dim must be even, got {d}")
    half = d // 2
    if positions.ndim == 1:
        positions = positions[None, :]
    freqs = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions[:, None, :, None].astype(jnp.float32) * freqs  # (b,1,s,half)
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
    return out.astype(x.dtype)
