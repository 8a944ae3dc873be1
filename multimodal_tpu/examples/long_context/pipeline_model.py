"""Pipeline-parallel LongContextLM — pipeline parallelism as a MODEL
capability, not just an op.

No reference counterpart (SURVEY §2.8: pipeline parallel absent upstream).
This wires ``parallel/pipeline.py``'s heterogeneous stage pipeline through
the full LM: stage 0 embeds tokens (``LMEmbed``), every pp device runs its
``K`` decoder blocks per virtual chunk (the SAME ``TransformerDecoderLayer``
module the sequential ``LongContextLM`` uses, so pp == sequential is exact
math, not approximate), and the last stage applies the final layer norm +
LM head and computes per-example next-token loss (``LMHead``).

Parameters round-trip with the sequential model via
``lm_params_to_pipeline`` / ``pipeline_params_to_lm``: the pp=4 trajectory
equivalence tests initialize a plain ``LongContextLM``, convert, train both,
and assert identical losses/params step by step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm
from multimodal_tpu.modules.layers.transformer import TransformerDecoderLayer
from multimodal_tpu.parallel.pipeline import (
    pipeline_stages_apply,
    split_microbatches,
    stack_block_params,
    unstack_block_params,
)


class LMEmbed(nn.Module):
    """Token + learned-position embedding (LongContextLM's input boundary)."""

    vocab_size: int
    max_seq_len: int
    d_model: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        b, s = tokens.shape
        x = nn.Embed(
            self.vocab_size, self.d_model, param_dtype=self.param_dtype,
            name="tok_embed",
        )(tokens).astype(self.dtype)
        pos = nn.Embed(
            self.max_seq_len, self.d_model, param_dtype=self.param_dtype,
            name="pos_embed",
        )(jnp.arange(s)[None, :]).astype(self.dtype)
        return x + pos


class LMHead(nn.Module):
    """Final layer norm + vocab projection (LongContextLM's output boundary)."""

    vocab_size: int
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        h = Fp32LayerNorm(
            eps=self.layer_norm_eps, param_dtype=self.param_dtype,
            name="final_layer_norm",
        )(h)
        return nn.Dense(
            self.vocab_size, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="lm_head",
        )(h)


class PipelinedLM:
    """LongContextLM trained over a ``pp`` mesh axis.

    Not a flax module: params are an explicit three-part dict
    ``{"embed", "blocks", "head"}`` whose ``blocks`` leaves lead with
    ``(n_virtual, n_stages, K)`` and shard ``P(None, 'pp')`` — each device
    holds only its own chunks' weights; embed/head replicate over pp.
    ``loss_fn(params, tokens)`` is jit-compatible and feeds ``Trainer``.
    """

    def __init__(
        self,
        vocab_size: int,
        max_seq_len: int,
        n_layer: int,
        d_model: int,
        n_head: int,
        dim_feedforward: int,
        mesh: Mesh,
        axis_name: str = "pp",
        n_virtual: int = 1,
        n_micro: Optional[int] = None,
        dp_axis_name: Optional[str] = "dp",
        remat_block: bool = True,
        dtype: Any = jnp.float32,
        param_dtype: Any = jnp.float32,
    ):
        self.cfg = dict(
            vocab_size=vocab_size, max_seq_len=max_seq_len, n_layer=n_layer,
            d_model=d_model, n_head=n_head, dim_feedforward=dim_feedforward,
        )
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_stages = mesh.shape[axis_name]
        self.n_virtual = n_virtual
        if n_layer % (self.n_stages * n_virtual):
            raise ValueError(
                f"n_layer={n_layer} must divide into n_stages*n_virtual="
                f"{self.n_stages * n_virtual} chunks"
            )
        self.n_micro = n_micro if n_micro is not None else self.n_stages
        self.remat_block = remat_block
        self.dtype = dtype
        self.param_dtype = param_dtype
        dp = dp_axis_name if (dp_axis_name in mesh.shape
                              and mesh.shape[dp_axis_name] > 1) else None
        # microbatch dim replicated, per-microbatch batch dim dp-sharded
        self.data_spec = P(None, dp) if dp else P()

        self.embed = LMEmbed(
            vocab_size, max_seq_len, d_model, dtype=dtype,
            param_dtype=param_dtype,
        )
        self.block = TransformerDecoderLayer(
            d_model=d_model, n_head=n_head, dim_feedforward=dim_feedforward,
            activation="gelu", layer_norm_eps=1e-5, norm_first=True,
            use_cross_attention=False, dtype=dtype, param_dtype=param_dtype,
        )
        self.head = LMHead(
            vocab_size, layer_norm_eps=1e-5, dtype=dtype,
            param_dtype=param_dtype,
        )

    # -- params --------------------------------------------------------------
    def init(self, rng: jax.Array) -> Any:
        """Init the SEQUENTIAL LongContextLM and convert — guarantees the
        pipelined model starts from exactly the distribution (and, given the
        same key, exactly the values) the unpipelined model would."""
        from multimodal_tpu.examples.long_context.model import LongContextLM

        lm = LongContextLM(
            **self.cfg,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        tokens = jnp.zeros((1, min(8, self.cfg["max_seq_len"])), jnp.int32)
        variables = jax.jit(lm.init)(rng, tokens)
        return lm_params_to_pipeline(
            variables, self.n_stages, self.n_virtual
        )

    def param_shardings(self, params: Any, mesh: Optional[Mesh] = None) -> Any:
        """blocks over pp (dim 1 of the (V, S, K, ...) stack); embed/head
        replicated. Signature doubles as a ``Trainer(shard_fn=...)``."""
        def spec(path_leaf):
            return NamedSharding(self.mesh, P(None, self.axis_name))

        return {
            "embed": jax.tree_util.tree_map(
                lambda _: NamedSharding(self.mesh, P()), params["embed"]
            ),
            "blocks": jax.tree_util.tree_map(spec, params["blocks"]),
            "head": jax.tree_util.tree_map(
                lambda _: NamedSharding(self.mesh, P()), params["head"]
            ),
        }

    # -- stage fns -------------------------------------------------------------
    def _first_fn(self, embed_params, x_item):
        return self.embed.apply({"params": embed_params}, x_item["tokens"][:, :-1])

    def _block_fn(self, layer_params, act):
        out, _ = self.block.apply(
            {"params": layer_params}, act,
            None, None, None, None, False, True, True,  # is_causal, determ.
        )
        return out

    def _last_fn(self, head_params, act, x_item):
        logits = self.head.apply({"params": head_params}, act)
        targets = x_item["tokens"][:, 1:]
        logp = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll, axis=-1)  # per-example loss: stays dp-shardable

    # -- training entry points ---------------------------------------------
    def microbatch(self, tokens: jnp.ndarray) -> Any:
        """(B, s+1) int tokens -> {"tokens": (n_micro, B/n_micro, s+1)}."""
        return {"tokens": split_microbatches(tokens, self.n_micro)}

    def loss_fn(self, params: Any, tokens: jnp.ndarray) -> jnp.ndarray:
        """Mean next-token loss of the FULL model (embed + L blocks + head)
        executed as a pp pipeline. Feed ``tokens`` of shape (B, s+1)."""
        per_example = pipeline_stages_apply(
            self._first_fn, self._block_fn, self._last_fn,
            params["embed"], params["blocks"], params["head"],
            self.microbatch(tokens),
            self.mesh, axis_name=self.axis_name, n_virtual=self.n_virtual,
            data_spec=self.data_spec, remat_block=self.remat_block,
        )
        return jnp.mean(per_example)


def lm_params_to_pipeline(variables: Any, n_stages: int, n_virtual: int = 1):
    """LongContextLM variables -> {"embed", "blocks", "head"} pipeline dict."""
    p = variables["params"]
    dec = p["decoder"]
    layer_names = sorted(
        (k for k in dec if k.startswith("layer_")),
        key=lambda k: int(k.split("_")[1]),
    )
    layers = [dec[k] for k in layer_names]
    return {
        "embed": {"tok_embed": p["tok_embed"], "pos_embed": p["pos_embed"]},
        "blocks": stack_block_params(layers, n_stages, n_virtual),
        "head": {
            "final_layer_norm": dec["final_layer_norm"],
            "lm_head": p["lm_head"],
        },
    }


def pipeline_params_to_lm(params: Any) -> Any:
    """Inverse: pipeline dict -> LongContextLM variables (for checkpoint
    interop/eval with the sequential model)."""
    layers = unstack_block_params(params["blocks"])
    dec = {f"layer_{i}": t for i, t in enumerate(layers)}
    dec["final_layer_norm"] = params["head"]["final_layer_norm"]
    return {
        "params": {
            "tok_embed": params["embed"]["tok_embed"],
            "pos_embed": params["embed"]["pos_embed"],
            "decoder": dec,
            "lm_head": params["head"]["lm_head"],
        }
    }
