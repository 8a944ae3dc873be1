"""ADM U-Net (guided-diffusion architecture).

Parity with reference ``diffusion_labs/models/adm_unet/``:
  - ``ADMResBlock`` (res_block.py:40): GroupNorm/SiLU conv block with
    scale-shift timestep conditioning, optional up/downsample on both paths,
    optional skip 1x1 conv and 1/sqrt(2) skip rescale.
  - ``ADMAttentionBlock`` + ``ADMCrossAttention`` (attention_block.py:16,75):
    spatial self-attention where conditioning tokens go through ONE shared
    ``cond_proj`` Linear(dim_cond -> 2c) whose halves are concatenated onto
    k and v per head.
  - ``ADMStack`` (adm.py:428): a typed block container that routes the
    residual conditional embedding to res blocks and the attention
    conditional tokens to attention blocks, so stacks compose uniformly.
  - ``ADMUNet`` (adm.py:27): timestep encoder (sinusoidal -> 2-layer MLP),
    learned conditional projections — the named context embedding is summed
    into the residual conditioning AND expanded to 4 learned attention
    tokens (adm.py:183-196, the DALL-E 2 "four tokens of context") — and the
    down/bottleneck/up stack layout with skip concatenation after every
    stack.
  - ``adm_unet`` (adm.py:522): the paper-scale builder.

TPU-native notes: NHWC layout end to end (MXU-friendly convs), fp32 group
norms under bf16 activations, and attention as plain jnp einsum — the
spatial token counts here (<=4k) are far below the flash-attention
crossover, so XLA fusion wins over a Pallas kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

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
    up/downsample on both hidden and skip paths (reference res_block.py:40)."""

    out_channels: int
    dim_cond: int
    resample: Optional[str] = None  # None | 'down' | 'up'
    rescale_skip_connection: bool = False
    scale_shift_conditional: bool = True
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
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

        cond_ch = 2 * self.out_channels if self.scale_shift_conditional else self.out_channels
        emb = nn.Dense(cond_ch, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="cond_proj")(
            jax.nn.silu(cond)
        )[:, None, None, :]
        if self.scale_shift_conditional:
            scale, shift = jnp.split(emb, 2, axis=-1)
            h = gn("norm2", self.out_channels)(h.astype(jnp.float32)).astype(h.dtype)
            h = h * (1 + scale) + shift
        else:
            h = gn("norm2", self.out_channels)(
                (h + emb).astype(jnp.float32)
            ).astype(h.dtype)
        h = jax.nn.silu(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = conv(self.out_channels, "conv2")(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="skip")(x)
        out = x + h
        if self.rescale_skip_connection:
            out = out / 1.414
        return out


class ADMAttentionBlock(nn.Module):
    """Spatial self-attention with ADMCrossAttention conditioning: extra
    tokens are projected by one shared ``cond_proj`` Linear(dim_cond -> 2c)
    and split per head onto k and v (reference attention_block.py:75)."""

    num_heads: int = 1
    rescale_skip_connection: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        norm = nn.GroupNorm(
            num_groups=_gn_groups(c), epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="norm",
        )
        tokens = norm(x.astype(jnp.float32)).astype(x.dtype).reshape(b, h * w, c)
        dense = lambda ch, name: nn.Dense(
            ch, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        split_heads = lambda t: t.reshape(b, -1, nh, t.shape[-1] // nh).transpose(0, 2, 1, 3)
        q = split_heads(dense(c, "q")(tokens))
        k = split_heads(dense(c, "k")(tokens))
        v = split_heads(dense(c, "v")(tokens))
        if attn_cond is not None:
            # (b, n, dim_cond) -> (b, nh, n, 2*hd) -> per-head k/v halves,
            # concatenated BEFORE the spatial keys (reference order; softmax
            # is position-invariant but converted weights must line up)
            cond = dense(2 * c, "cond_proj")(attn_cond.astype(tokens.dtype))
            cond = split_heads(cond)
            cond_k, cond_v = jnp.split(cond, 2, axis=-1)
            k = jnp.concatenate([cond_k, k], axis=2)
            v = jnp.concatenate([cond_v, v], axis=2)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(hd).astype(jnp.float32),
            axis=-1,
        ).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = dense(c, "proj")(out)
        out = x + out.reshape(b, h, w, c)
        if self.rescale_skip_connection:
            out = out / 1.414
        return out


class ADMStack(nn.Module):
    """Typed block container (reference adm.py:428): routes the residual
    conditional embedding to res blocks, the attention tokens to attention
    blocks, and nothing to simple blocks, so down/bottleneck/up stacks all
    call with the same signature. Blocks are given as (kind, config) specs —
    ("res", ADMResBlock kwargs), ("attn", ADMAttentionBlock kwargs), or
    ("conv", nn.Conv kwargs) — and constructed inside this module's scope so
    parameters nest under the stack (stack_name/res_0/...)."""

    blocks: Sequence[Tuple[str, Dict[str, Any]]]
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        res_cond: jnp.ndarray,
        attn_cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = x
        for i, (kind, cfg) in enumerate(self.blocks):
            if kind == "res":
                cfg = dict(cfg)
                cfg.setdefault("dropout_rate", self.dropout_rate)
                h = ADMResBlock(name=f"res_{i}", **common, **cfg)(
                    h, res_cond, deterministic=deterministic
                )
            elif kind == "attn":
                h = ADMAttentionBlock(name=f"attn_{i}", **common, **cfg)(h, attn_cond)
            else:
                h = nn.Conv(name=f"conv_{i}", **common, **cfg)(h)
        return h


def adm_stack_res(out_channels: int, dim_cond: int, name=None,
                  dropout_rate: float = 0.0, **common) -> ADMStack:
    return ADMStack(
        [("res", dict(out_channels=out_channels, dim_cond=dim_cond))],
        dropout_rate=dropout_rate, name=name, **common,
    )


def adm_stack_res_attn(
    out_channels: int, dim_res_cond: int, num_heads: int = 1, name=None,
    dropout_rate: float = 0.0, **common
) -> ADMStack:
    return ADMStack(
        [
            ("res", dict(out_channels=out_channels, dim_cond=dim_res_cond)),
            ("attn", dict(num_heads=num_heads)),
        ],
        dropout_rate=dropout_rate, name=name, **common,
    )


def adm_stack_res_down(num_channels: int, dim_cond: int, name=None,
                       dropout_rate: float = 0.0, **common) -> ADMStack:
    return ADMStack(
        [("res", dict(out_channels=num_channels, dim_cond=dim_cond, resample="down"))],
        dropout_rate=dropout_rate, name=name, **common,
    )


def adm_stack_res_up(num_channels: int, dim_cond: int, name=None,
                     dropout_rate: float = 0.0, **common) -> ADMStack:
    return ADMStack(
        [("res", dict(out_channels=num_channels, dim_cond=dim_cond, resample="up"))],
        dropout_rate=dropout_rate, name=name, **common,
    )


class ADMUNet(nn.Module):
    """Down/bottleneck/up U-Net with timestep + learned conditional
    projections (reference adm.py:27)."""

    channels_per_layer: Sequence[int] = (128, 256, 256, 256)
    num_resize: int = 3
    num_res_per_layer: int = 2
    use_attention_for_layer: Sequence[bool] = (False, True, True, True)
    dim_res_cond: int = 512
    dim_attn_cond: Optional[int] = None
    in_channels: int = 3
    out_channels: int = 3
    predict_variance_value: bool = True
    time_embed_dim: int = 128
    embed_name: str = "context"
    num_heads: int = 1
    variance_value_transform: Optional[Callable] = None
    # reference ADMResBlock trains with pre_outconv_dropout=0.1
    # (res_block.py:40); inference parity is unaffected (deterministic=True)
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timestep: jnp.ndarray,
        conditional_inputs: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> DiffusionOutput:
        conditional_inputs = conditional_inputs or {}
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = x.shape[0]

        # timestep encoder: sinusoidal -> Linear -> SiLU -> Linear
        t_embed = SinusoidalPositionEmbeddings(self.time_embed_dim)(timestep)
        t_embed = nn.Dense(self.dim_res_cond, name="time_dense1", **common)(
            t_embed.astype(self.dtype)
        )
        t_embed = nn.Dense(self.dim_res_cond, name="time_dense2", **common)(
            jax.nn.silu(t_embed)
        )

        # conditional projections: every [b, c] input is summed into the
        # residual conditioning; the named context embedding additionally
        # becomes 4 learned attention tokens (adm.py:183-196); [b, n, c]
        # inputs are projected and concatenated as attention tokens directly.
        res_cond = t_embed
        attn_tokens: List[jnp.ndarray] = []
        for key in sorted(conditional_inputs.keys()):
            val = conditional_inputs[key]
            if val.ndim == 2:
                res_cond = res_cond + nn.Dense(
                    self.dim_res_cond, name=f"res_cond_{key}", **common
                )(val.astype(self.dtype))
                if self.dim_attn_cond is not None and key == self.embed_name:
                    tok = nn.Dense(
                        4 * self.dim_attn_cond, name=f"attn_cond_{key}", **common
                    )(val.astype(self.dtype))
                    attn_tokens.append(tok.reshape(b, 4, self.dim_attn_cond))
            else:
                tok = nn.Dense(
                    self.dim_attn_cond or self.channels_per_layer[0],
                    name=f"attn_cond_{key}", **common,
                )(val.astype(self.dtype))
                attn_tokens.append(tok)
        attn_cond = jnp.concatenate(attn_tokens, axis=1) if attn_tokens else None

# Downsampling encoder: skip saved after EVERY stack incl. conv_in
        h = nn.Conv(self.channels_per_layer[0], (3, 3), padding=1,
                    name="conv_in", **common)(x)
        skips: List[jnp.ndarray] = [h]
        for li, ch in enumerate(self.channels_per_layer):
            for bi in range(self.num_res_per_layer):
                if self.use_attention_for_layer[li]:
                    stack = adm_stack_res_attn(
                        ch, self.dim_res_cond, num_heads=self.num_heads,
                        dropout_rate=self.dropout_rate,
                        name=f"down_{li}_{bi}", **common,
                    )
                else:
                    stack = adm_stack_res(
                        ch, self.dim_res_cond, dropout_rate=self.dropout_rate,
                        name=f"down_{li}_{bi}", **common
                    )
                h = stack(h, res_cond, attn_cond, deterministic=deterministic)
                skips.append(h)
            if li < self.num_resize:
                h = adm_stack_res_down(
                    ch, self.dim_res_cond, dropout_rate=self.dropout_rate,
                    name=f"down_resize_{li}", **common
                )(h, res_cond, attn_cond, deterministic=deterministic)
                skips.append(h)

        # Bottleneck: res -> attn -> res in one stack
        mid_ch = self.channels_per_layer[-1]
        h = ADMStack(
            [
                ("res", dict(out_channels=mid_ch, dim_cond=self.dim_res_cond)),
                ("attn", dict(num_heads=self.num_heads)),
                ("res", dict(out_channels=mid_ch, dim_cond=self.dim_res_cond)),
            ],
            dropout_rate=self.dropout_rate, name="bottleneck", **common,
        )(h, res_cond, attn_cond, deterministic=deterministic)

        # Upsampling decoder: skip concat before every stack; the upsample
        # res block rides inside the layer's last stack (adm.py:310-316)
        up_channels = list(reversed(self.channels_per_layer))
        up_attn = list(reversed(self.use_attention_for_layer))
        for li, ch in enumerate(up_channels):
            for bi in range(self.num_res_per_layer + 1):
                blocks: List[Tuple[str, Dict[str, Any]]] = [
                    ("res", dict(out_channels=ch, dim_cond=self.dim_res_cond))
                ]
                if up_attn[li]:
                    blocks.append(("attn", dict(num_heads=self.num_heads)))
                if bi == self.num_res_per_layer and li < self.num_resize:
                    blocks.append(
                        ("res", dict(out_channels=ch, dim_cond=self.dim_res_cond,
                                     resample="up"))
                    )
                if skips:  # more channels than resize layers leaves no skip
                    h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ADMStack(
                    blocks, dropout_rate=self.dropout_rate,
                    name=f"up_{li}_{bi}", **common,
                )(h, res_cond, attn_cond, deterministic=deterministic)

        h = nn.GroupNorm(
            num_groups=_gn_groups(h.shape[-1]), epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="norm_out",
        )(h.astype(jnp.float32)).astype(h.dtype)
        out_ch = self.out_channels * (2 if self.predict_variance_value else 1)
        h = nn.Conv(out_ch, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
                    name="conv_out", **common)(jax.nn.silu(h))

        if self.predict_variance_value:
            prediction, variance_raw = jnp.split(h, 2, axis=-1)
            transform = self.variance_value_transform or (lambda v: (v + 1) / 2)
            return DiffusionOutput(
                prediction=prediction, variance_value=transform(variance_raw)
            )
        return DiffusionOutput(prediction=h)


def adm_unet(
    *,
    time_embed_dim: int = 512,
    cond_embed_dim: int = 2048,
    embed_name: str = "context",
    predict_variance_value: bool = True,
    image_channels: int = 4,
    depth: int = 512,
    num_resize: int = 3,
    num_res_per_layer: int = 3,
    **kwargs: Any,
) -> ADMUNet:
    """Paper-scale conditional ADM U-Net (reference adm.py:522): channels
    grow as depth*(i+1) per resolution, attention everywhere below full res,
    context conditioning through both the residual and attention paths."""
    channels_per_layer = [depth * (i + 1) for i in range(num_resize + 1)]
    use_attention_per_layer = [False] + [True] * num_resize
    return ADMUNet(
        channels_per_layer=channels_per_layer,
        num_resize=num_resize,
        num_res_per_layer=num_res_per_layer,
        use_attention_for_layer=use_attention_per_layer,
        dim_res_cond=cond_embed_dim,
        dim_attn_cond=cond_embed_dim,
        in_channels=image_channels,
        out_channels=image_channels,
        time_embed_dim=time_embed_dim,
        embed_name=embed_name,
        predict_variance_value=predict_variance_value,
        **kwargs,
    )
