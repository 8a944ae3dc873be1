"""ADM U-Net (guided-diffusion architecture).

Parity with reference ``diffusion_labs/models/adm_unet/`` (ADMUNet:27,
adm_unet:522, res blocks ``res_block.py`` with scale-shift timestep
conditioning, attention blocks ``attention_block.py`` with optional
attention-conditioning tokens, ADMStack composition). NHWC layout; outputs
``DiffusionOutput`` with optional learned variance.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.diffusion_labs.utils import DiffusionOutput
from multimodal_tpu.modules.layers.position_embedding import (
    SinusoidalPositionEmbeddings,
)


def _gn_groups(c: int) -> int:
    for g in (32, 8, 4, 2, 1):
        if c % g == 0:
            return g
    return 1


class ADMResBlock(nn.Module):
    """GroupNorm/SiLU conv block with scale-shift conditioning; optional
    up/downsample on the residual path (reference res_block.py)."""

    out_channels: int
    dim_cond: int
    resample: Optional[str] = None  # None | 'down' | 'up'
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        gn = lambda name, c: nn.GroupNorm(
            num_groups=_gn_groups(c), epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name,
        )
        conv = lambda ch, name: nn.Conv(
            ch, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )

        def resize(t):
            b, h, w, c = t.shape
            if self.resample == "down":
                return nn.avg_pool(t, (2, 2), strides=(2, 2))
            if self.resample == "up":
                return jax.image.resize(t, (b, h * 2, w * 2, c), "nearest")
            return t

        h = jax.nn.silu(gn("norm1", x.shape[-1])(x.astype(jnp.float32)).astype(x.dtype))
        h = resize(h)
        x = resize(x)
        h = conv(self.out_channels, "conv1")(h)

        # scale-shift conditioning
        emb = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="cond_proj")(
            jax.nn.silu(cond)
        )
        scale, shift = jnp.split(emb[:, None, None, :], 2, axis=-1)
        h = gn("norm2", self.out_channels)(h.astype(jnp.float32)).astype(h.dtype)
        h = h * (1 + scale) + shift
        h = conv(self.out_channels, "conv2")(jax.nn.silu(h))

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="skip")(x)
        return x + h


class ADMAttentionBlock(nn.Module):
    """Spatial self-attention with optional extra conditioning tokens
    (reference attention_block.py)."""

    num_heads: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        norm = nn.GroupNorm(
            num_groups=_gn_groups(c), epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="norm",
        )
        tokens = norm(x.astype(jnp.float32)).astype(x.dtype).reshape(b, h * w, c)
        qkv_dense = lambda name: nn.Dense(
            c, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = qkv_dense("q")(tokens)
        k = qkv_dense("k")(tokens)
        v = qkv_dense("v")(tokens)
        if attn_cond is not None:
            # cross-attention on extra tokens: each block owns its own k/v
            # projection FROM the conditional dim, so conditioning reaches
            # every resolution regardless of channel width (reference
            # attention_block.py ADMCrossAttention semantics)
            cond = attn_cond.astype(tokens.dtype)
            k = jnp.concatenate([k, qkv_dense("k_cond")(cond)], axis=1)
            v = jnp.concatenate([v, qkv_dense("v_cond")(cond)], axis=1)
        hd = c // self.num_heads
        shape_q = lambda t: t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            (shape_q(q) @ shape_q(k).swapaxes(-2, -1)) / jnp.sqrt(hd), axis=-1
        )
        out = (attn @ shape_q(v)).transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="proj")(out)
        return x + out.reshape(b, h, w, c)


class ADMUNet(nn.Module):
    """Down/bottleneck/up U-Net with timestep + conditional projections."""

    channels_per_layer: Sequence[int] = (128, 256, 256, 256)
    num_resize: int = 3
    num_res_per_layer: int = 2
    use_attention_for_layer: Sequence[bool] = (False, True, True, True)
    dim_res_cond: int = 512
    dim_attn_cond: Optional[int] = None
    in_channels: int = 3
    out_channels: int = 3
    predict_variance_value: bool = True
    embed_dim: int = 128
    num_heads: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timestep: jnp.ndarray,
        conditional_inputs: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> DiffusionOutput:
        conditional_inputs = conditional_inputs or {}
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # timestep + residual conditioning embedding
        t_embed = SinusoidalPositionEmbeddings(self.embed_dim)(timestep)
        t_embed = nn.Dense(self.dim_res_cond, name="time_dense1", **common)(
            t_embed.astype(self.dtype)
        )
        t_embed = nn.Dense(self.dim_res_cond, name="time_dense2", **common)(
            jax.nn.silu(t_embed)
        )
        res_cond = t_embed
        attn_cond = None
        for key in sorted(conditional_inputs.keys()):
            val = conditional_inputs[key]
            if val.ndim == 2:
                res_cond = res_cond + nn.Dense(
                    self.dim_res_cond, name=f"res_cond_{key}", **common
                )(val.astype(self.dtype))
            else:
                tok = nn.Dense(
                    self.dim_attn_cond or self.channels_per_layer[0],
                    name=f"attn_cond_{key}", **common,
                )(val.astype(self.dtype))
                attn_cond = tok if attn_cond is None else jnp.concatenate([attn_cond, tok], axis=1)

        h = nn.Conv(self.channels_per_layer[0], (3, 3), padding=1, name="conv_in", **common)(x)
        skips: List[jnp.ndarray] = [h]

        # Downsampling encoder
        for li, ch in enumerate(self.channels_per_layer):
            for bi in range(self.num_res_per_layer):
                h = ADMResBlock(ch, self.dim_res_cond, name=f"down_{li}_{bi}", **common)(h, res_cond)
                if self.use_attention_for_layer[li]:
                    h = ADMAttentionBlock(self.num_heads, name=f"down_attn_{li}_{bi}", **common)(h, attn_cond)
                skips.append(h)
            if li < self.num_resize:
                h = ADMResBlock(ch, self.dim_res_cond, resample="down",
                                name=f"down_resize_{li}", **common)(h, res_cond)
                skips.append(h)

        # Bottleneck
        mid_ch = self.channels_per_layer[-1]
        h = ADMResBlock(mid_ch, self.dim_res_cond, name="mid_res1", **common)(h, res_cond)
        h = ADMAttentionBlock(self.num_heads, name="mid_attn", **common)(h, attn_cond)
        h = ADMResBlock(mid_ch, self.dim_res_cond, name="mid_res2", **common)(h, res_cond)

        # Upsampling decoder
        up_channels = list(reversed(self.channels_per_layer))
        up_attn = list(reversed(self.use_attention_for_layer))
        for li, ch in enumerate(up_channels):
            for bi in range(self.num_res_per_layer + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ADMResBlock(ch, self.dim_res_cond, name=f"up_{li}_{bi}", **common)(h, res_cond)
                if up_attn[li]:
                    h = ADMAttentionBlock(self.num_heads, name=f"up_attn_{li}_{bi}", **common)(h, attn_cond)
            if li < self.num_resize:
                h = ADMResBlock(ch, self.dim_res_cond, resample="up",
                                name=f"up_resize_{li}", **common)(h, res_cond)

        h = nn.GroupNorm(
            num_groups=_gn_groups(h.shape[-1]), epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="norm_out",
        )(h.astype(jnp.float32)).astype(h.dtype)
        out_ch = self.out_channels * (2 if self.predict_variance_value else 1)
        h = nn.Conv(out_ch, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
                    name="conv_out", **common)(jax.nn.silu(h))

        if self.predict_variance_value:
            prediction, variance_raw = jnp.split(h, 2, axis=-1)
            # map to [0, 1] variance interpolation value
            variance_value = (variance_raw + 1) / 2
            return DiffusionOutput(prediction=prediction, variance_value=variance_value)
        return DiffusionOutput(prediction=h)


def adm_unet(
    in_channels: int = 3,
    out_channels: int = 3,
    channels_per_layer: Sequence[int] = (128, 256, 256, 256),
    dim_res_cond: int = 512,
    predict_variance_value: bool = True,
    **kwargs: Any,
) -> ADMUNet:
    """Builder mirroring reference ``adm.py:522`` defaults."""
    return ADMUNet(
        in_channels=in_channels,
        out_channels=out_channels,
        channels_per_layer=channels_per_layer,
        dim_res_cond=dim_res_cond,
        predict_variance_value=predict_variance_value,
        **kwargs,
    )
