"""SwinV2-style windowed transformer (AudioMAE decoder).

Parity with reference ``models/masked_auto_encoder/swin_decoder.py``
(WindowMultiHeadAttention:19, SwinTransformerBlock:152, SwinTransformer:350):
scaled-cosine attention with learnable per-head temperature, log-spaced
continuous relative-position bias from a 2->heads meta-MLP, cyclic-shifted
windows with the standard block attention mask.

TPU notes: window partition/reverse are pure reshapes+transposes (free in
XLA); the per-window attention batches all windows into one fused attention
call so the MXU sees one large batched matmul.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.transformer import TransformerOutput


def _relative_coords_log(window_size: Tuple[int, int]) -> np.ndarray:
    """(window_area^2, 2) log-spaced signed relative coordinates."""
    wh, ww = window_size
    ys, xs = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    coords = np.stack([ys.ravel(), xs.ravel()])  # (2, area)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, area, area)
    rel = rel.transpose(1, 2, 0).reshape(-1, 2).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


def _shift_attn_mask(
    input_size: Tuple[int, int], window_size: Tuple[int, int], shift_size: Tuple[int, int]
) -> Optional[np.ndarray]:
    """(num_windows, area, area) additive mask for shifted windows."""
    if not any(shift_size):
        return None
    h, w = input_size
    wh, ww = window_size
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -shift_size[0] or None), slice(-shift_size[0] or h, None)):
        for ws in (slice(0, -ww), slice(-ww, -shift_size[1] or None), slice(-shift_size[1] or w, None)):
            img[hs, ws] = cnt
            cnt += 1
    windows = img.reshape(h // wh, wh, w // ww, ww).transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowMultiHeadAttention(nn.Module):
    input_dim: int
    num_heads: int
    window_size: Tuple[int, int]
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    meta_hidden_dim: int = 384
    meta_mlp_dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bsz, seq_len, embed_dim = x.shape
        area = self.window_size[0] * self.window_size[1]
        if seq_len != area:
            raise ValueError(f"Input sequence length {seq_len} must equal window area {area}")
        hd = embed_dim // self.num_heads

        qkv = nn.Dense(3 * embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(bsz, seq_len, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # scaled-cosine attention (SwinV2): normalized q.k / learnable tau
        qn = jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True)
        denom = jnp.maximum(qn @ kn.swapaxes(-2, -1), 1e-6)
        attn = (q.astype(jnp.float32) @ k.astype(jnp.float32).swapaxes(-2, -1)) / denom
        tau = self.param("tau", nn.initializers.ones, (self.num_heads,), jnp.float32)
        attn = attn / jnp.maximum(tau, 0.01).reshape(1, self.num_heads, 1, 1)

        # continuous relative position bias from the meta MLP
        rel_log = jnp.asarray(_relative_coords_log(self.window_size))
        bias = MLP(
            in_dim=2, hidden_dims=self.meta_hidden_dim, out_dim=self.num_heads,
            activation="relu", dropout=self.meta_mlp_dropout,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="meta_mlp",
        )(rel_log, deterministic=deterministic)
        bias = bias.T.reshape(self.num_heads, area, area)[None]
        attn = attn + bias

        if mask is not None:
            num_win = mask.shape[0]
            attn = attn.reshape(bsz // num_win, num_win, self.num_heads, area, area)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bsz, self.num_heads, area, area)

        attn = jax.nn.softmax(attn, axis=-1)
        if self.attn_dropout > 0 and not deterministic:
            attn = nn.Dropout(self.attn_dropout, deterministic=False)(attn)

        out = (attn.astype(v.dtype) @ v).transpose(0, 2, 1, 3).reshape(bsz, seq_len, embed_dim)
        out = nn.Dense(embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj")(out)
        return nn.Dropout(self.proj_dropout, deterministic=deterministic)(out)


class SwinTransformerBlock(nn.Module):
    input_dim: int
    num_heads: int
    input_size: Tuple[int, int]
    window_size: Tuple[int, int]
    feedforward_dim: int
    shift_size: Tuple[int, int] = (0, 0)
    mlp_dropout: float = 0.0
    attn_dropout: float = 0.0
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _effective(self):
        ws = tuple(min(f, w) for f, w in zip(self.input_size, self.window_size))
        ss = tuple(0 if f <= w else s for f, w, s in zip(self.input_size, ws, self.shift_size))
        return ws, ss

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h, w = self.input_size
        bsz, seq_len, c = x.shape
        if seq_len != h * w:
            raise ValueError(f"Input sequence length {seq_len} must equal input area {h * w}")
        ws, ss = self._effective()
        wh, ww = ws

        def window_attention(t):
            t = t.reshape(bsz, h, w, c)
            if any(ss):
                t = jnp.roll(t, shift=(-ss[0], -ss[1]), axis=(1, 2))
            # partition: (b*nw, area, c)
            t = t.reshape(bsz, h // wh, wh, w // ww, ww, c)
            t = t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, c)
            mask = _shift_attn_mask((h, w), ws, ss)
            attn_out = WindowMultiHeadAttention(
                self.input_dim, self.num_heads, ws,
                attn_dropout=self.attn_dropout, proj_dropout=self.mlp_dropout,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
            )(t, jnp.asarray(mask) if mask is not None else None, deterministic)
            # reverse
            t = attn_out.reshape(bsz, h // wh, w // ww, wh, ww, c)
            t = t.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, h, w, c)
            if any(ss):
                t = jnp.roll(t, shift=(ss[0], ss[1]), axis=(1, 2))
            return t.reshape(bsz, seq_len, c)

        ln = lambda name: nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name=name,
        )
        # SwinV2 residual-post-norm ordering (reference swin_decoder.py:341-343)
        x = x + ln("norm1")(window_attention(x).astype(jnp.float32)).astype(x.dtype)
        mlp_out = MLP(
            in_dim=self.input_dim, hidden_dims=self.feedforward_dim,
            out_dim=self.input_dim, dropout=self.mlp_dropout, activation="gelu",
            dtype=self.dtype, param_dtype=self.param_dtype, name="mlp",
        )(x, deterministic=deterministic)
        x = x + ln("norm2")(mlp_out.astype(jnp.float32)).astype(x.dtype)
        return x


class SwinTransformer(nn.Module):
    """Stack of swin blocks; odd layers use shift (2, 0) (reference :386)."""

    n_layer: int
    input_dim: int
    num_heads: int
    input_size: Tuple[int, int]
    window_size: Tuple[int, int]
    feedforward_dim: int
    mlp_dropout: float = 0.0
    attn_dropout: float = 0.0
    layer_norm_eps: float = 1e-5
    final_layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> TransformerOutput:
        for idx in range(self.n_layer):
            shift = (0, 0) if idx % 2 == 0 else (2, 0)
            x = SwinTransformerBlock(
                input_dim=self.input_dim,
                num_heads=self.num_heads,
                input_size=self.input_size,
                window_size=self.window_size,
                shift_size=shift,
                feedforward_dim=self.feedforward_dim,
                mlp_dropout=self.mlp_dropout,
                attn_dropout=self.attn_dropout,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{idx}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(
            epsilon=self.final_layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="final_layer_norm",
        )(x.astype(jnp.float32)).astype(x.dtype)
        return TransformerOutput(last_hidden_state=x)
