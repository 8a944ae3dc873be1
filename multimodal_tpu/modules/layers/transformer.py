"""Transformer encoder / decoder blocks.

Parity with reference ``modules/layers/transformer.py``
(TransformerEncoderLayer:31, TransformerEncoder:157,
TransformerDecoderLayer:258, TransformerDecoder:524, TransformerOutput:22).

TPU-native notes:
  - LayerNorms use the fp32-compute ``Fp32LayerNorm`` so bf16 activations
    keep the reference's numerics.
  - Per-layer KV caches are explicit ``(k, v)`` pytrees returned through
    ``TransformerOutput.current_key_values`` — the functional analog of the
    reference's in-module cache threading (``transformer.py:625-643``).
  - ``remat`` rematerializes each block (``jax.checkpoint``) — the analog of
    the reference's ``apply_activation_checkpointing`` over encoder layers
    (``examples/flava/native/train.py:148-165``).
"""

from __future__ import annotations

from typing import Any, Callable, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.moe import MoEFeedForward
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
    MultiHeadSelfAttention,
)
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm


class TransformerOutput(NamedTuple):
    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None
    hidden_states: Optional[Tuple[jnp.ndarray, ...]] = None
    attentions: Optional[Tuple[jnp.ndarray, ...]] = None
    image_labels: Optional[jnp.ndarray] = None
    current_key_values: Optional[Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]] = None


class StochasticDepth(nn.Module):
    """Row-mode stochastic depth (drop-path), matching torchvision semantics."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class TransformerEncoderLayer(nn.Module):
    """Pre- or post-norm encoder block: MHSA + MLP with residuals."""

    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: Union[str, Callable] = "relu"
    layer_norm_eps: float = 1e-12
    norm_first: bool = False
    drop_path_rate: Optional[float] = None
    cp_axis_name: Optional[str] = None
    moe_num_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    ep_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.attention = MultiHeadSelfAttention(
            embed_dim=self.d_model, num_heads=self.n_head, dropout=self.dropout,
            cp_axis_name=self.cp_axis_name,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        if self.moe_num_experts:
            self.feedforward = MoEFeedForward(
                dim=self.d_model, hidden_dim=self.dim_feedforward,
                num_experts=self.moe_num_experts,
                num_experts_per_token=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                activation=self.activation, ep_axis_name=self.ep_axis_name,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
        else:
            self.feedforward = MLP(
                self.d_model, self.d_model, self.dim_feedforward,
                dropout=self.dropout, activation=self.activation,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
        self.attention_layernorm = Fp32LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        self.feedforward_layernorm = Fp32LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        if self.drop_path_rate is not None:
            self.drop_path = StochasticDepth(self.drop_path_rate)
        else:
            self.drop_path = None
        self.residual_dropout = nn.Dropout(self.dropout)

    def _residual_drop(self, x, deterministic):
        if self.drop_path is not None:
            return self.drop_path(x, deterministic=deterministic)
        return self.residual_dropout(x, deterministic=deterministic)

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attn_weights: bool = False,
    ):
        x = hidden_states
        probs = None
        if self.norm_first:
            attn = self.attention(
                self.attention_layernorm(x), attn_mask=attention_mask,
                return_attn_weights=return_attn_weights, deterministic=deterministic,
            )
            if return_attn_weights:
                attn, probs = attn
            x = x + self._residual_drop(attn, deterministic)
            ff = self.feedforward(self.feedforward_layernorm(x), deterministic=deterministic)
            out = x + self._residual_drop(ff, deterministic)
        else:
            attn = self.attention(
                x, attn_mask=attention_mask,
                return_attn_weights=return_attn_weights, deterministic=deterministic,
            )
            if return_attn_weights:
                attn, probs = attn
            x = self.attention_layernorm(x + self._residual_drop(attn, deterministic))
            ff = self.feedforward(x, deterministic=deterministic)
            out = self.feedforward_layernorm(x + self._residual_drop(ff, deterministic))
        if return_attn_weights:
            return out, probs
        return out


class _EncoderScanBlock(nn.Module):
    """One encoder block in the ``nn.scan`` layout (see ``scan_layers``)."""

    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float
    activation: Union[str, Callable]
    layer_norm_eps: float
    norm_first: bool
    cp_axis_name: Optional[str]
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, hidden_states, attention_mask, deterministic: bool = True):
        out = TransformerEncoderLayer(
            self.d_model, self.n_head, self.dim_feedforward, self.dropout,
            self.activation, self.layer_norm_eps, self.norm_first,
            None, cp_axis_name=self.cp_axis_name,
            dtype=self.dtype, param_dtype=self.param_dtype, name="layer",
        )(hidden_states, attention_mask, deterministic, False)
        return out, ()


class TransformerEncoder(nn.Module):
    """Stack of encoder layers with optional final LN and drop-path schedule.

    ``scan_layers=True`` swaps the Python loop for ``nn.scan`` over one
    block with a stacked ``(n_layer, ...)`` param tree: the step is traced
    and compiled ONCE regardless of depth, which is what makes the 64-layer
    10B-scale configs compile in minutes instead of hours (the reference's
    eager loop has no analog of this — a TPU/XLA-first capability). The
    scanned layout computes the same math as the loop given the same
    per-layer weights (``stack_encoder_layer_params`` converts; outputs
    agree to fusion-level float reassociation, ~1e-6); it returns
    only the final hidden state (no per-layer hidden/attention taps) and is
    mutually exclusive with MoE interleaving and per-layer drop-path rates.
    """

    n_layer: int
    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: Union[str, Callable] = "relu"
    layer_norm_eps: float = 1e-12
    norm_first: bool = False
    final_layer_norm_eps: Optional[float] = None
    drop_path_rate: Optional[float] = None
    remat: bool = False
    scan_layers: bool = False
    cp_axis_name: Optional[str] = None
    # MoE: when moe_num_experts is set, every ``moe_interval``-th layer
    # (GShard-style interleaving; 1 = all layers) swaps its dense MLP for a
    # MoEFeedForward routed over ``ep_axis_name``.
    moe_num_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_interval: int = 2
    ep_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        return_hidden_states: bool = False,
        return_attn_weights: bool = False,
        deterministic: bool = True,
    ) -> TransformerOutput:
        if self.scan_layers:
            if (
                return_hidden_states
                or return_attn_weights
                or self.moe_num_experts is not None
                or self.drop_path_rate is not None
            ):
                raise ValueError(
                    "scan_layers supports neither per-layer taps "
                    "(hidden_states/attentions) nor MoE interleaving nor "
                    "drop-path schedules; use the loop layout for those"
                )
            block = _EncoderScanBlock
            if self.remat:
                block = nn.remat(
                    _EncoderScanBlock, static_argnums=(3,),
                    policy=jax.checkpoint_policies.nothing_saveable,
                )
            stack = nn.scan(
                block,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.n_layer,
            )(
                self.d_model, self.n_head, self.dim_feedforward, self.dropout,
                self.activation, self.layer_norm_eps, self.norm_first,
                self.cp_axis_name, self.dtype, self.param_dtype,
                name="layers",
            )
            hidden_states, _ = stack(hidden_states, attention_mask, deterministic)
            if self.final_layer_norm_eps is not None:
                hidden_states = Fp32LayerNorm(
                    eps=self.final_layer_norm_eps, param_dtype=self.param_dtype,
                    name="final_layer_norm",
                )(hidden_states)
            return TransformerOutput(last_hidden_state=hidden_states)

        if self.drop_path_rate is not None:
            drop_rates = [
                float(r) for r in jnp.linspace(0.0, self.drop_path_rate, self.n_layer)
            ]
        else:
            drop_rates = [None] * self.n_layer

        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(
                TransformerEncoderLayer, static_argnums=(3, 4),
                policy=jax.checkpoint_policies.nothing_saveable,
            )

        all_hidden_states: List[jnp.ndarray] = []
        all_attentions: List[jnp.ndarray] = []
        for i in range(self.n_layer):
            if return_hidden_states:
                all_hidden_states.append(hidden_states)
            is_moe = (
                self.moe_num_experts is not None
                and (i + 1) % self.moe_interval == 0
            )
            out = layer_cls(
                self.d_model, self.n_head, self.dim_feedforward, self.dropout,
                self.activation, self.layer_norm_eps, self.norm_first,
                drop_rates[i], cp_axis_name=self.cp_axis_name,
                moe_num_experts=self.moe_num_experts if is_moe else None,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                ep_axis_name=self.ep_axis_name,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(hidden_states, attention_mask, deterministic, return_attn_weights)
            if return_attn_weights:
                hidden_states, probs = out
                all_attentions.append(probs)
            else:
                hidden_states = out
        if return_hidden_states:
            all_hidden_states.append(hidden_states)

        if self.final_layer_norm_eps is not None:
            hidden_states = Fp32LayerNorm(
                eps=self.final_layer_norm_eps, param_dtype=self.param_dtype,
                name="final_layer_norm",
            )(hidden_states)

        return TransformerOutput(
            last_hidden_state=hidden_states,
            hidden_states=tuple(all_hidden_states) if return_hidden_states else None,
            attentions=tuple(all_attentions) if return_attn_weights else None,
        )


class TransformerDecoderLayer(nn.Module):
    """Decoder block: causal self-attn (+KV cache), optional cross-attn, MLP."""

    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: Union[str, Callable] = "relu"
    layer_norm_eps: float = 1e-12
    norm_first: bool = False
    use_cross_attention: bool = True
    dim_kv: Optional[int] = None
    cp_axis_name: Optional[str] = None
    cp_layout: str = "contiguous"
    moe_num_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    ep_axis_name: Optional[str] = None
    n_kv_head: Optional[int] = None  # grouped-query self-attention
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        dim_kv = self.dim_kv if self.dim_kv is not None else self.d_model
        self.attention = MultiHeadAttentionWithCache(
            dim_q=self.d_model, dim_kv=self.d_model, num_heads=self.n_head,
            dropout=self.dropout, cp_axis_name=self.cp_axis_name,
            cp_layout=self.cp_layout, num_kv_heads=self.n_kv_head,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.attention_layernorm = Fp32LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        if self.use_cross_attention:
            self.cross_attention = MultiHeadAttentionWithCache(
                dim_q=self.d_model, dim_kv=dim_kv, num_heads=self.n_head,
                dropout=self.dropout, dtype=self.dtype, param_dtype=self.param_dtype,
            )
            self.cross_attention_layernorm = Fp32LayerNorm(
                eps=self.layer_norm_eps, param_dtype=self.param_dtype
            )
        if self.moe_num_experts:
            self.feedforward = MoEFeedForward(
                dim=self.d_model, hidden_dim=self.dim_feedforward,
                num_experts=self.moe_num_experts,
                num_experts_per_token=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                activation=self.activation, ep_axis_name=self.ep_axis_name,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
        else:
            self.feedforward = MLP(
                self.d_model, self.d_model, self.dim_feedforward,
                dropout=self.dropout, activation=self.activation,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
        self.feedforward_layernorm = Fp32LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        self.residual_dropout = nn.Dropout(self.dropout)

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        cross_attention_mask: Optional[jnp.ndarray] = None,
        past_key_value: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        use_cache: bool = False,
        is_causal: bool = False,
        deterministic: bool = True,
        cache_index: Optional[jnp.ndarray] = None,
        rope_positions: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
        drop = lambda t: self.residual_dropout(t, deterministic=deterministic)
        x = hidden_states
        present_kv = None

        def self_attn(inp):
            out = self.attention(
                inp, inp, inp, attn_mask=attention_mask,
                past_key_value=past_key_value, is_causal=is_causal,
                use_cache=use_cache, deterministic=deterministic,
                cache_index=cache_index, rope_positions=rope_positions,
                segment_ids=segment_ids,
            )
            if use_cache:
                return out.attn_output, out.past_key_value
            return out, None

        if self.norm_first:
            attn_out, present_kv = self_attn(self.attention_layernorm(x))
            x = x + drop(attn_out)
            if self.use_cross_attention and encoder_hidden_states is not None:
                ca = self.cross_attention(
                    self.cross_attention_layernorm(x), encoder_hidden_states,
                    encoder_hidden_states, attn_mask=cross_attention_mask,
                    deterministic=deterministic,
                )
                x = x + drop(ca)
            ff = self.feedforward(self.feedforward_layernorm(x), deterministic=deterministic)
            x = x + drop(ff)
        else:
            attn_out, present_kv = self_attn(x)
            x = self.attention_layernorm(x + drop(attn_out))
            if self.use_cross_attention:
                if encoder_hidden_states is None:
                    raise ValueError("encoder_hidden_states required for cross attention")
                ca = self.cross_attention(
                    x, encoder_hidden_states, encoder_hidden_states,
                    attn_mask=cross_attention_mask, deterministic=deterministic,
                )
                x = self.cross_attention_layernorm(x + drop(ca))
            ff = self.feedforward(x, deterministic=deterministic)
            x = self.feedforward_layernorm(x + drop(ff))
        return x, present_kv


class TransformerDecoder(nn.Module):
    """Stack of decoder layers; cross-attention every ``cross_attention_interval``
    layers (reference ``transformer.py:577``); threads per-layer KV caches."""

    n_layer: int
    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: Union[str, Callable] = "relu"
    layer_norm_eps: float = 1e-12
    norm_first: bool = False
    use_cross_attention: bool = True
    dim_kv: Optional[int] = None
    cross_attention_interval: int = 1
    final_layer_norm_eps: Optional[float] = None
    remat: bool = False
    cp_axis_name: Optional[str] = None
    cp_layout: str = "contiguous"
    moe_num_experts: Optional[int] = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_interval: int = 2
    ep_axis_name: Optional[str] = None
    n_kv_head: Optional[int] = None  # grouped-query self-attention
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        cross_attention_mask: Optional[jnp.ndarray] = None,
        past_key_values: Optional[Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]] = None,
        use_cache: bool = False,
        is_causal: bool = False,
        return_hidden_states: bool = False,
        deterministic: bool = True,
        cache_index: Optional[jnp.ndarray] = None,
        rope_positions: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
    ) -> TransformerOutput:
        layer_cls = TransformerDecoderLayer
        if self.remat:
            # args: (self)0, hidden1, enc_hidden2, attn_mask3, ca_mask4,
            # pkv5, use_cache6, is_causal7, deterministic8
            layer_cls = nn.remat(
                TransformerDecoderLayer, static_argnums=(6, 7, 8),
                policy=jax.checkpoint_policies.nothing_saveable,
            )

        all_hidden_states: List[jnp.ndarray] = []
        current_key_values: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        for i in range(self.n_layer):
            if return_hidden_states:
                all_hidden_states.append(hidden_states)
            use_ca = self.use_cross_attention and i % self.cross_attention_interval == 0
            pkv = past_key_values[i] if past_key_values is not None else None
            is_moe = (
                self.moe_num_experts is not None
                and (i + 1) % self.moe_interval == 0
            )
            hidden_states, present_kv = layer_cls(
                self.d_model, self.n_head, self.dim_feedforward, self.dropout,
                self.activation, self.layer_norm_eps, self.norm_first,
                use_ca, self.dim_kv, cp_axis_name=self.cp_axis_name,
                cp_layout=self.cp_layout,
                moe_num_experts=self.moe_num_experts if is_moe else None,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                ep_axis_name=self.ep_axis_name,
                n_kv_head=self.n_kv_head,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(
                # positional so remat's static_argnums can see the statics
                hidden_states,
                encoder_hidden_states,
                attention_mask,
                cross_attention_mask,
                pkv,
                use_cache,
                is_causal,
                deterministic,
                cache_index,
                rope_positions,
                segment_ids,
            )
            if use_cache and present_kv is not None:
                current_key_values.append(present_kv)
        if return_hidden_states:
            all_hidden_states.append(hidden_states)

        if self.final_layer_norm_eps is not None:
            hidden_states = Fp32LayerNorm(
                eps=self.final_layer_norm_eps, param_dtype=self.param_dtype,
                name="final_layer_norm",
            )(hidden_states)

        return TransformerOutput(
            last_hidden_state=hidden_states,
            hidden_states=tuple(all_hidden_states) if return_hidden_states else None,
            current_key_values=tuple(current_key_values) if use_cache else None,
        )


def stack_encoder_layer_params(encoder_params, n_layer: int):
    """Loop-layout encoder params (``layer_0..layer_{n-1}``) -> scan layout.

    The scan layout stores one stacked ``(n_layer, ...)`` leaf per parameter
    under ``layers/layer``; non-layer entries (e.g. ``final_layer_norm``)
    pass through. Given weights converted this way, ``scan_layers=True``
    computes the same blocks in the same order as the loop layout — only
    the trace/compile structure (and hence XLA fusion choices) changes.
    """
    layers = [encoder_params[f"layer_{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {
        k: v for k, v in encoder_params.items() if not k.startswith("layer_")
    }
    out["layers"] = {"layer": stacked}
    return out


def unstack_encoder_layer_params(encoder_params):
    """Inverse of :func:`stack_encoder_layer_params` (scan -> loop layout)."""
    stacked = encoder_params["layers"]["layer"]
    n_layer = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {k: v for k, v in encoder_params.items() if k != "layers"}
    for i in range(n_layer):
        out[f"layer_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out
