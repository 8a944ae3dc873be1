"""Swin Transformer 3D encoder (Omnivore trunk).

Parity with reference ``modules/encoders/swin_transformer_3d_encoder.py``
(SwinTransformer3dEncoder wrapping torchvision's SwinTransformer3d):
PatchEmbed3d, 3-D shifted-window attention with relative position bias,
patch merging between stages, final norm + global average pool.

TPU notes: window partition/reverse are reshapes (free); all windows batch
into one fused attention call; the shifted-window attention mask and the
relative-position index are compile-time numpy constants.
"""

from __future__ import annotations

import itertools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.modules.layers.mlp import MLP


def _rel_pos_index(
    window_size: Tuple[int, int, int],
    table_window: Optional[Tuple[int, int, int]] = None,
) -> np.ndarray:
    """(N, N) indices into the (2T-1)(2H-1)(2W-1) relative-bias table.

    ``table_window`` sizes the table (the configured window); ``window_size``
    is the effective (possibly smaller) window for this input.
    """
    tw = table_window or window_size
    wt, wh, ww = window_size
    tt, th, twd = tw
    coords = np.stack(
        np.meshgrid(np.arange(wt), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += tt - 1
    rel[..., 1] += th - 1
    rel[..., 2] += twd - 1
    rel[..., 0] *= (2 * th - 1) * (2 * twd - 1)
    rel[..., 1] *= 2 * twd - 1
    return rel.sum(-1)


def _window_attn_mask(dims, window_size, shift_size) -> Optional[np.ndarray]:
    """(num_windows, N, N) additive mask for shifted 3-D windows."""
    if not any(shift_size):
        return None
    t, h, w = dims
    wt, wh, ww = window_size
    img = np.zeros((t, h, w))
    cnt = 0
    for ts in (slice(0, -wt), slice(-wt, -shift_size[0] or None), slice(-shift_size[0] or t, None)):
        for hs in (slice(0, -wh), slice(-wh, -shift_size[1] or None), slice(-shift_size[1] or h, None)):
            for ws in (slice(0, -ww), slice(-ww, -shift_size[2] or None), slice(-shift_size[2] or w, None)):
                img[ts, hs, ws] = cnt
                cnt += 1
    win = img.reshape(t // wt, wt, h // wh, wh, w // ww, ww)
    win = win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wt * wh * ww)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention3d(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]          # effective window for this input
    table_window: Optional[Tuple[int, int, int]] = None  # configured window (table size)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (num_windows*b, N, dim)."""
        bnw, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.swapaxes(-2, -1)) / jnp.sqrt(hd)

        wt, wh, ww = self.table_window or self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1), self.num_heads),
            self.param_dtype,
        )
        idx = jnp.asarray(_rel_pos_index(self.window_size, self.table_window))
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, self.num_heads, n, n)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")(out)


class SwinBlock3d(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (8, 7, 7)
    shift: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (b, T, H, W, C)."""
        b, t, h, w, c = x.shape
        ws = tuple(min(d, s) for d, s in zip((t, h, w), self.window_size))
        ss = tuple(0 if d <= s else s // 2 for d, s in zip((t, h, w), ws)) if self.shift else (0, 0, 0)
        # pad to window multiples
        pt, ph, pw = [(-d) % s for d, s in zip((t, h, w), ws)]
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name=name)

        def attention(inp):
            xp = jnp.pad(inp, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)))
            T, H, W = t + pt, h + ph, w + pw
            if any(ss):
                xp = jnp.roll(xp, shift=tuple(-s for s in ss), axis=(1, 2, 3))
            win = xp.reshape(b, T // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], c)
            win = win.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, ws[0] * ws[1] * ws[2], c)
            mask = _window_attn_mask((T, H, W), ws, ss)
            out = WindowAttention3d(
                self.dim, self.num_heads, ws, table_window=self.window_size,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
            )(win, jnp.asarray(mask) if mask is not None else None)
            out = out.reshape(b, T // ws[0], H // ws[1], W // ws[2], ws[0], ws[1], ws[2], c)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, T, H, W, c)
            if any(ss):
                out = jnp.roll(out, shift=ss, axis=(1, 2, 3))
            return out[:, :t, :h, :w]

        x = x + attention(ln("norm1")(x.astype(jnp.float32)).astype(x.dtype))
        mlp_out = MLP(
            c, c, int(c * self.mlp_ratio), dropout=0.0, activation="gelu",
            dtype=self.dtype, param_dtype=self.param_dtype, name="mlp",
        )(ln("norm2")(x.astype(jnp.float32)).astype(x.dtype), deterministic=deterministic)
        return x + mlp_out


class PatchMerging3d(nn.Module):
    """2x2 spatial merge + linear reduction (time untouched)."""

    dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        ph, pw = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
        parts = [x[:, :, i::2, j::2] for i, j in itertools.product(range(2), range(2))]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="reduction")(x)


class PatchEmbed3d(nn.Module):
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    use_norm: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, T, H, W, C) -> (b, T', H', W', embed_dim). Pads spatial/
        temporal dims to patch multiples (torchvision PatchEmbed3d behavior,
        which also makes T=1 single images work with temporal patch 2)."""
        pads = [(0, (-d) % p) for d, p in zip(x.shape[1:4], self.patch_size)]
        x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
        x = nn.Conv(
            self.embed_dim, kernel_size=self.patch_size, strides=self.patch_size,
            padding="VALID", dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj",
        )(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name="norm")(
                x.astype(jnp.float32)
            ).astype(x.dtype)
        return x


class SwinTransformer3d(nn.Module):
    """Swin3D trunk: patch embed -> stages (blocks + merge) -> norm -> pool."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    num_classes: Optional[int] = None
    patch_embed: Optional[nn.Module] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        embedder = self.patch_embed or PatchEmbed3d(
            self.patch_size, self.embed_dim, name="patch_embed", **common
        )
        x = embedder(x)
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock3d(
                    dim, self.num_heads[si], self.window_size, shift=bi % 2 == 1,
                    mlp_ratio=self.mlp_ratio, name=f"stage{si}_block{bi}", **common,
                )(x, deterministic=deterministic)
            if si < len(self.depths) - 1:
                x = PatchMerging3d(dim, name=f"merge{si}", **common)(x)
                dim *= 2
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = jnp.mean(x, axis=(1, 2, 3))  # global average pool
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, name="head", **common)(x)
        return x


class SwinTransformer3dEncoder(nn.Module):
    """Named wrapper matching the reference encoder module."""

    trunk: SwinTransformer3d

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.trunk(x, deterministic=deterministic)
