"""Fused Pallas kernels for SHORT-sequence encoder blocks (CLIP/ViT/BERT).

Why these exist: the flash kernel (``ops/flash_attention.py``) wins from
~512 sequence up, but the multimodal encoders run at seq 50-210 where the
XLA path is byte-bound on LAYOUT traffic, not scores. The round-4 HLO byte
ledger (``scripts/roofline_ledger.py``) of the CLIP ViT-B/32 inference
program showed ~520 MB/layer of pure copies: the qkv split re-materializes
the (B, S, 3D) buffer, the per-head (B, H, S, Dh) transposes copy q/k/v
again, the softmax materializes (B, H, S, S) probs, and the output
transposes back — over half the program's HBM traffic, on a chip where the
program is bandwidth-bound (measured ~550 GB/s effective of 819).

``fused_qkv_attention`` consumes the fused QKV projection's output
DIRECTLY in its natural (B, S, 3*D) layout and writes attention output in
the (B, S, D) layout the output projection wants: zero layout copies, and
scores/probs never touch HBM. The grid runs over batch blocks; each step
loads its (Bb, S, 3D) qkv block into VMEM once and the (statically
unrolled) head loop slices q/k/v per head in-register, so each qkv byte is
read from HBM exactly once.

``fused_mlp`` computes act(x @ W1 + b1) @ W2 + b2 with the (rows, d_ff)
intermediate living only in VMEM — the XLA path writes + re-reads it twice
(~630 MB/layer at CLIP batch 512). Weights sit resident in VMEM across the
row-block grid (constant index maps), so they stream from HBM once.

Both are differentiable via custom_vjp with an XLA-recompute backward (the
backward recomputes the reference XLA forward's internals and takes its
exact VJP): training uses them safely; inference gets the full byte win.

No reference counterpart (the reference leans on torch SDPA +
``nn.Linear``; this fusion is TPU roofline work, reference
``modules/layers/multi_head_attention.py:74`` is the API being served).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_FUSED_SEQ = 256          # above this, use flash / XLA instead
_VMEM_BLOCK_BUDGET = 6 << 20  # attention: in/out blocks per grid step (2x buffered)
_MLP_VMEM_BUDGET = 14 << 20   # mlp: weights resident + row blocks
_MLP_BWD_VMEM_BUDGET = 20 << 20  # mlp backward: resident weights + 128-row blocks


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fused_encoder_available(seq: int, embed_dim: int, num_heads: int) -> bool:
    """Dispatch predicate: TPU present (or forced-interpret for tests),
    short sequence, clean head split."""
    if os.environ.get("MMTPU_DISABLE_FUSED_ENCODER"):
        return False
    if seq > _MAX_FUSED_SEQ or embed_dim % num_heads:
        return False
    if (embed_dim // num_heads) % 8:
        return False  # keep head slices sublane-aligned
    if os.environ.get("MMTPU_FORCE_FUSED_ENCODER"):
        return True
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ("tpu", "axon") or "tpu" in getattr(
        jax.devices()[0], "device_kind", ""
    ).lower()


# Generic-module activation names (modules/layers/activation.ACT2FN) -> the
# fused kernel's activation table. NOTE the "gelu" flip: the library's
# "gelu" is exact (approximate=False) while the kernel table's "gelu" is the
# tanh approximation — map through this, never pass ACT2FN names directly.
FUSED_ACT_FOR = {
    "gelu": "gelu_exact",
    "gelu_tanh": "gelu",
    "quick_gelu": "quick_gelu",
    "relu": "relu",
    "silu": "silu",
    "swish": "silu",
}


def fused_mlp_available(in_dim: int, hidden_dim: int, out_dim: int) -> bool:
    """Dispatch predicate for routing a generic two-matmul MLP through
    ``fused_mlp``: TPU present (or forced for interpret tests) and
    lane-aligned widths (the kernel keeps weights VMEM-resident in full
    (din, dff)/(dff, dout) blocks)."""
    if os.environ.get("MMTPU_DISABLE_FUSED_ENCODER"):
        return False
    if in_dim % 128 or hidden_dim % 128 or out_dim % 128:
        return False
    if os.environ.get("MMTPU_FORCE_FUSED_ENCODER"):
        return True
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ("tpu", "axon") or "tpu" in getattr(
        jax.devices()[0], "device_kind", ""
    ).lower()


def _batch_block(b: int, per_example_bytes: int) -> int:
    """Largest divisor of ``b`` whose block stays under the VMEM budget."""
    cap = max(1, _VMEM_BLOCK_BUDGET // max(per_example_bytes, 1))
    best = 1
    for d in range(1, b + 1):
        if b % d == 0 and d <= cap:
            best = d
    return best


# --------------------------------------------------------------------------
# fused QKV self-attention
# --------------------------------------------------------------------------


def _attn_head_loop(qkv_ref, o_ref, kb, *, scale, causal, seq, num_heads, d):
    """Shared forward head loop; ``kb`` is an optional (Bb, S) fp32
    key-padding additive bias (0 = attend, large-negative = masked)."""
    dh = d // num_heads
    mask = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        mask = (col <= row)[None]
    for h in range(num_heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]            # (Bb, S, Dh)
        k = qkv_ref[:, :, d + h * dh: d + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * d + h * dh: 2 * d + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (Bb, S, S) fp32
        if kb is not None:
            s = s + kb[:, None, :]
        if mask is not None:
            s = jnp.where(mask, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def _qkv_attn_kernel(qkv_ref, o_ref, *, scale, causal, seq, num_heads, d):
    _attn_head_loop(qkv_ref, o_ref, None, scale=scale, causal=causal,
                    seq=seq, num_heads=num_heads, d=d)


def _qkv_attn_kernel_kb(qkv_ref, kb_ref, o_ref, *, scale, causal, seq,
                        num_heads, d, bb):
    # kb arrives as the FULL (B, S) array (constant index map — a (bb, S)
    # block would violate the (8, 128) tile rule whenever bb % 8 != 0);
    # slice this grid step's batch rows here
    kb = kb_ref[pl.ds(pl.program_id(0) * bb, bb), :]
    _attn_head_loop(qkv_ref, o_ref, kb, scale=scale, causal=causal,
                    seq=seq, num_heads=num_heads, d=d)


def _qkv_attention_impl(qkv, num_heads, is_causal, sm_scale, key_bias=None):
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    scale = sm_scale if sm_scale is not None else dh ** -0.5
    # block budget: qkv + out blocks plus one head's fp32 score matrix
    per_ex = s * (three_d + d) * qkv.dtype.itemsize + s * s * 4
    bb = _batch_block(b, per_ex)

    in_specs = [
        pl.BlockSpec(
            (bb, s, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    operands = [qkv]
    if key_bias is not None:
        kernel = functools.partial(
            _qkv_attn_kernel_kb, scale=scale, causal=is_causal, seq=s,
            num_heads=num_heads, d=d, bb=bb,
        )
        in_specs.append(
            pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(key_bias.astype(jnp.float32))
    else:
        kernel = functools.partial(
            _qkv_attn_kernel, scale=scale, causal=is_causal, seq=s,
            num_heads=num_heads, d=d,
        )
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        interpret=_interpret(),
    )(*operands)


def _qkv_attn_bwd_loop(qkv_ref, g_ref, dqkv_ref, kb, *, scale, causal, seq,
                       num_heads, d):
    """Blockwise attention backward: recompute p per head in VMEM, emit
    dqkv in the same fused (Bb, S, 3D) layout. Standard softmax-attention
    VJP: dv = p^T g, dp = g v^T, ds = p (dp - rowsum(dp*p)) * scale,
    dq = ds k, dk = ds^T q. ``kb`` is the optional key-padding bias the
    forward applied (masked keys get p ~ 0, so their dk/dv vanish)."""
    dh = d // num_heads
    mask = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        mask = (col <= row)[None]
    for h in range(num_heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, d + h * dh: d + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * d + h * dh: 2 * d + (h + 1) * dh]
        g = g_ref[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if kb is not None:
            s = s + kb[:, None, :]
        if mask is not None:
            s = jnp.where(mask, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # (Bb, Sq, Sk) fp32
        pb = p.astype(qkv_ref.dtype)
        dv = jax.lax.dot_general(  # sum_q p[q,k] g[q,d] -> (Bb, Sk, Dh)
            pb, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # g[q,d] v[k,d] -> (Bb, Sq, Sk)
            g, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale)
        dsb = ds.astype(qkv_ref.dtype)
        dq = jax.lax.dot_general(  # ds[q,k] k[k,d] -> (Bb, Sq, Dh)
            dsb, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(  # sum_q ds[q,k] q[q,d] -> (Bb, Sk, Dh)
            dsb, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, d + h * dh: d + (h + 1) * dh] = dk.astype(
            dqkv_ref.dtype
        )
        dqkv_ref[:, :, 2 * d + h * dh: 2 * d + (h + 1) * dh] = dv.astype(
            dqkv_ref.dtype
        )


def _qkv_attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, scale, causal, seq,
                         num_heads, d):
    _qkv_attn_bwd_loop(qkv_ref, g_ref, dqkv_ref, None, scale=scale,
                       causal=causal, seq=seq, num_heads=num_heads, d=d)


def _qkv_attn_bwd_kernel_kb(qkv_ref, kb_ref, g_ref, dqkv_ref, *, scale,
                            causal, seq, num_heads, d, bb):
    # kb is the FULL (B, S) array (see _qkv_attn_kernel_kb); slice this
    # grid step's batch rows
    kb = kb_ref[pl.ds(pl.program_id(0) * bb, bb), :]
    _qkv_attn_bwd_loop(qkv_ref, g_ref, dqkv_ref, kb, scale=scale,
                       causal=causal, seq=seq, num_heads=num_heads, d=d)


def _qkv_attention_bwd_impl(qkv, g, num_heads, is_causal, sm_scale,
                            key_bias=None):
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    scale = sm_scale if sm_scale is not None else dh ** -0.5
    # qkv + g + dqkv blocks (double-buffered) plus fp32 score temps
    per_ex = s * (three_d * 2 + d) * qkv.dtype.itemsize * 2 + 3 * s * s * 4
    bb = _batch_block(b, per_ex)
    in_specs = [
        pl.BlockSpec(
            (bb, s, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [qkv]
    if key_bias is not None:
        kernel = functools.partial(
            _qkv_attn_bwd_kernel_kb, scale=scale, causal=is_causal, seq=s,
            num_heads=num_heads, d=d, bb=bb,
        )
        in_specs.append(
            pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(key_bias.astype(jnp.float32))
    else:
        kernel = functools.partial(
            _qkv_attn_bwd_kernel, scale=scale, causal=is_causal, seq=s,
            num_heads=num_heads, d=d,
        )
    in_specs.append(
        pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )
    operands.append(g)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, s, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, three_d), qkv.dtype),
        interpret=_interpret(),
    )(*operands)


def _qkv_attention_xla(qkv, num_heads, is_causal, sm_scale, key_bias=None):
    """Reference XLA computation of the same function (backward path)."""
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    scale = sm_scale if sm_scale is not None else dh ** -0.5
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_bias is not None:
        logits = logits + key_bias[:, None, None, :].astype(jnp.float32)
    if is_causal:
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))
        logits = jnp.where(causal, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_qkv_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    key_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention straight off the fused QKV projection.

    Args:
        qkv: ``(B, S, 3*D)`` — the fused in-projection output, laid out
            ``[q | k | v]`` along the feature axis (each of width D, heads
            contiguous within each part).
        key_bias: optional ``(B, S)`` fp32 additive key-padding bias
            (0 = attend, large-negative = masked), applied to every query
            row — the BERT-style padded-text mask. Treated as data: no
            gradient flows to it (callers pass ``stop_gradient`` masks).
    Returns:
        ``(B, S, D)`` attention output, ready for the out projection.
    """
    return _qkv_attention_impl(qkv, num_heads, is_causal, sm_scale, key_bias)


def _qkv_attn_fwd(qkv, num_heads, is_causal, sm_scale, key_bias):
    out = _qkv_attention_impl(qkv, num_heads, is_causal, sm_scale, key_bias)
    return out, (qkv, key_bias)


def _qkv_attn_bwd(num_heads, is_causal, sm_scale, res, g):
    qkv, key_bias = res
    dqkv = _qkv_attention_bwd_impl(
        qkv, g, num_heads, is_causal, sm_scale, key_bias
    )
    dkb = None if key_bias is None else jnp.zeros_like(key_bias)
    return (dqkv, dkb)


fused_qkv_attention.defvjp(_qkv_attn_fwd, _qkv_attn_bwd)


def key_padding_bias(
    attn_mask: jnp.ndarray, batch: int, seq: int
) -> Optional[jnp.ndarray]:
    """Convert a broadcast key-padding mask — bool or additive-float
    ``(b|1, 1, 1, S)``, the shape every BERT-style tower emits — into the
    ``(B, S)`` fp32 bias lane ``fused_qkv_attention`` accepts. Returns None
    for any mask the fused kernel cannot express (per-query structure,
    per-head bias), signalling the caller to keep the XLA path."""
    if (
        attn_mask.ndim != 4
        or attn_mask.shape[1] != 1
        or attn_mask.shape[2] != 1
        or attn_mask.shape[3] != seq
    ):
        return None
    if attn_mask.dtype == jnp.bool_:
        kb = jnp.where(attn_mask[:, 0, 0, :], 0.0, -1e30).astype(jnp.float32)
    elif jnp.issubdtype(attn_mask.dtype, jnp.floating):
        kb = attn_mask[:, 0, 0, :].astype(jnp.float32)
    else:
        return None
    if kb.shape[0] == 1 and batch > 1:
        kb = jnp.broadcast_to(kb, (batch, seq))
    elif kb.shape[0] != batch:
        return None
    return jax.lax.stop_gradient(kb)


# --------------------------------------------------------------------------
# fused MLP
# --------------------------------------------------------------------------

def _erf_poly(x):
    """Abramowitz–Stegun 7.1.26 rational erf (|err| <= 1.5e-7): Mosaic has
    no erf/erfc lowering, so the in-kernel exact gelu uses this. The XLA
    fallback and the backward recompute keep the true ``lax.erf``."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _gelu_exact_kernel(x):
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


_ACTIVATIONS = {
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "gelu": jax.nn.gelu,
    "gelu_exact": functools.partial(jax.nn.gelu, approximate=False),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}

# In-kernel variants: identical except gelu_exact, which Mosaic cannot lower
# (erf/erfc unimplemented) and so runs the 1.5e-7-accurate polynomial.
_KERNEL_ACTIVATIONS = dict(_ACTIVATIONS, gelu_exact=_gelu_exact_kernel)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act):
    x = x_ref[...]  # (Rb, Din)
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)  # bias blocks are (1, D)
    h = _KERNEL_ACTIVATIONS[act](h).astype(x.dtype)
    o = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _mlp_impl(x, w1, b1, w2, b2, activation):
    orig_shape = x.shape
    din = orig_shape[-1]
    dff = w1.shape[-1]
    dout = w2.shape[-1]
    rows = 1
    for dim in orig_shape[:-1]:
        rows *= dim
    x2 = x.reshape(rows, din)
    # row block: weights (resident) + x + fp32 intermediate + out per row
    # VMEM: weights resident once (constant index maps — no double buffer),
    # x/out blocks double-buffered, fp32 intermediate as a compiler temp
    per_row = (din + dout) * x.dtype.itemsize * 2 + dff * (x.dtype.itemsize + 4)
    weight_bytes = (din * dff + dff * dout) * w1.dtype.itemsize
    budget = _MLP_VMEM_BUDGET - weight_bytes
    if x.dtype.itemsize >= 4:
        # fp32 rows: Mosaic's measured footprint runs well above this byte
        # model (the fp32 intermediate is double-buffered — Swin3D 384->1536
        # measured 20.04 MB against a 13.7 MB estimate, tripping the default
        # 16 MB scoped-vmem limit). Raising vmem_limit_bytes is NOT a safe
        # fix: a blanket raise changed Mosaic's scheduling on
        # previously-working shapes and faulted the device (round-5 prod
        # smoke, CoCa 512->2048 fp32). Instead shrink the row block so the
        # worst-case footprint stays inside the default limit; bf16 paths
        # (the production inference/train configs) are untouched.
        budget = (10 << 20) - weight_bytes
    if budget < per_row * 64:
        # weights too large to keep resident with a useful row block —
        # the fused kernel would degrade to tiny-matmul grid steps
        return _mlp_xla(x, w1, b1, w2, b2, activation)
    rb = min(512, max(8, budget // max(per_row, 1) // 8 * 8))  # sublane mult
    grid = pl.cdiv(rows, rb)
    kernel = functools.partial(_mlp_kernel, act=activation)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rb, din), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dff, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, dout), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, dout), x.dtype),
        interpret=_interpret(),
    )(x2, w1, b1.reshape(1, dff), w2, b2.reshape(1, dout))
    return out.reshape(*orig_shape[:-1], dout)


def _mlp_xla(x, w1, b1, w2, b2, activation):
    h = (x @ w1 + b1.astype(x.dtype)).astype(jnp.float32)
    h = _ACTIVATIONS[activation](h).astype(x.dtype)
    return h @ w2 + b2.astype(x.dtype)


# fp32 (act(z), act'(z)) pairs for the blockwise backward recompute. The
# derivatives are the exact analytic forms of _ACTIVATIONS' entries, so the
# kernel backward matches jax.vjp of the XLA path to float tolerance
# (gelu_exact's in-kernel erf is the 1.5e-7 polynomial, as in the forward).
def _act_and_grad(name, z):
    if name == "quick_gelu":
        s = jax.nn.sigmoid(1.702 * z)
        return z * s, s * (1.0 + 1.702 * z * (1.0 - s))
    if name == "silu":
        s = jax.nn.sigmoid(z)
        return z * s, s * (1.0 + z * (1.0 - s))
    if name == "relu":
        return jnp.maximum(z, 0.0), (z > 0.0).astype(z.dtype)
    if name == "gelu":  # tanh approximation
        c = 0.7978845608028654  # sqrt(2/pi)
        u = c * (z + 0.044715 * z ** 3)
        t = jnp.tanh(u)
        du = c * (1.0 + 3 * 0.044715 * z * z)
        return 0.5 * z * (1.0 + t), 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * du
    if name == "gelu_exact":
        erf = _erf_poly(z * (2.0 ** -0.5))
        pdf = jnp.exp(-0.5 * z * z) * 0.3989422804014327  # 1/sqrt(2*pi)
        return 0.5 * z * (1.0 + erf), 0.5 * (1.0 + erf) + z * pdf
    raise ValueError(f"unknown activation {name!r}")


def _mlp_bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, dx_ref, da_ref,
                    h_ref, *, act):
    """Row-block MLP backward stage 1: recompute z = x@W1+b1 in VMEM (fp32
    accumulate, matching the forward kernel), emit
      h  = act(z)            (for dW2 = h^T g outside)
      da = (g @ W2^T)*act'(z) (for dW1 = x^T da, db1 = sum da outside)
      dx = da @ W1^T
    The fp32 (rows, d_ff) tensors never touch HBM — the XLA-recompute VJP
    this replaces materialized them (z, act-grad, dh) every step."""
    x = x_ref[...]
    g = g_ref[...]
    z = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h, dact = _act_and_grad(act, z)
    dh = jax.lax.dot_general(  # g @ W2^T -> (Rb, Dff)
        g, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = dh * dact
    da_c = da.astype(da_ref.dtype)
    dx = jax.lax.dot_general(  # da @ W1^T -> (Rb, Din)
        da_c, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h_ref[...] = h.astype(h_ref.dtype)
    da_ref[...] = da_c
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _mlp_bwd_pallas(x2, g2, w1, b1, w2, activation):
    """Stage-1 kernel launch over row blocks; returns (dx, da, h) with
    da/h in the compute dtype. Caller handles the weight/bias grads."""
    rows, din = x2.shape
    dff = w1.shape[-1]
    dout = w2.shape[-1]
    itm = x2.dtype.itemsize
    weight_bytes = (din * dff + dff * dout) * w1.dtype.itemsize
    # per-row: x/dx/g blocks double-buffered + da/h output blocks
    # double-buffered + ~4 fp32 (Rb, Dff) compiler stack temps (z, act',
    # dh, da — measured: the Mosaic stack runs ~1.2x this model, so the
    # pallas_call raises vmem_limit_bytes to 2x budget for headroom)
    per_row = (2 * din + dout) * itm * 2 + 2 * dff * itm * 2 + 4 * dff * 4
    budget = _MLP_BWD_VMEM_BUDGET - weight_bytes
    if budget < per_row * 8:
        return None
    rb = min(256, max(8, budget // max(per_row, 1) // 8 * 8))
    if rb >= 128:
        rb = rb // 128 * 128  # full-width MXU row tiles
    grid = pl.cdiv(rows, rb)
    kernel = functools.partial(_mlp_bwd_kernel, act=activation)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rb, din), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dff, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, din), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, dff), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, dff), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, din), x2.dtype),
            jax.ShapeDtypeStruct((rows, dff), x2.dtype),
            jax.ShapeDtypeStruct((rows, dff), x2.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _MLP_BWD_VMEM_BUDGET
        ),
        interpret=_interpret(),
    )(x2, g2, w1, b1.reshape(1, dff), w2)


def _mlp_bwd_acc_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, dx_ref,
                        dw1_ref, dw2_ref, db1_ref, *, act, rb, total_rows):
    """Single-kernel MLP backward: per row block, recompute z = x@W1+b1 in
    VMEM and ACCUMULATE the weight grads into fp32 VMEM-resident outputs
    (constant index maps) across the sequential grid — nothing but x, g,
    dx and the final dW/db ever touch HBM. The dW GEMMs contract over the
    128-row block (K=128: one full systolic pass)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    x = x_ref[...]
    g = g_ref[...]
    if total_rows % rb:
        # ragged tail: zero padding rows so they cannot leak into the
        # accumulated dW/db (dx's padding rows are masked on write anyway)
        row = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0) + i * rb
        valid = row < total_rows
        x = jnp.where(valid, x, 0)
        g = jnp.where(valid, g, 0)
    z = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h, dact = _act_and_grad(act, z)
    dh = jax.lax.dot_general(
        g, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = dh * dact
    da_c = da.astype(x.dtype)
    h_c = h.astype(x.dtype)
    dx = jax.lax.dot_general(
        da_c, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw1_ref[...] += jax.lax.dot_general(  # x^T da -> (Din, Dff)
        x, da_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_ref[...] += jax.lax.dot_general(  # h^T g -> (Dff, Dout)
        h_c, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[...] += jnp.sum(da, axis=0, keepdims=True)


_MLP_BWD_ACC_VMEM_BUDGET = 48 << 20  # weights + 2 fp32 dW accumulators


def _mlp_bwd_acc_pallas(x2, g2, w1, b1, w2, activation):
    """Launch the accumulating backward; returns (dx, dw1_f32, dw2_f32,
    db1_f32) or None when the dW accumulators don't fit VMEM."""
    rows, din = x2.shape
    dff = w1.shape[-1]
    dout = w2.shape[-1]
    itm = x2.dtype.itemsize
    resident = (
        (din * dff + dff * dout) * w1.dtype.itemsize  # weights
        + (din * dff + dff * dout) * 4                # fp32 dW accumulators
        + dff * 4
    )
    rb = 128
    per_row = (2 * din + dout) * itm * 2 + 4 * dff * 4
    if resident + rb * per_row > _MLP_BWD_ACC_VMEM_BUDGET:
        return None
    grid = pl.cdiv(rows, rb)
    kernel = functools.partial(
        _mlp_bwd_acc_kernel, act=activation, rb=rb, total_rows=rows
    )
    zero = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rb, din), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dff), zero, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dff), zero, memory_space=pltpu.VMEM),
            pl.BlockSpec((dff, dout), zero, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, din), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dff), zero, memory_space=pltpu.VMEM),
            pl.BlockSpec((dff, dout), zero, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dff), zero, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, din), x2.dtype),
            jax.ShapeDtypeStruct((din, dff), jnp.float32),
            jax.ShapeDtypeStruct((dff, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dff), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MLP_BWD_ACC_VMEM_BUDGET + (16 << 20)
        ),
        interpret=_interpret(),
    )(x2, g2, w1, b1.reshape(1, dff), w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, activation: str = "gelu"):
    """act(x @ W1 + b1) @ W2 + b2 with the intermediate in VMEM only.

    All operands must share the compute dtype (cast weights before the
    call); the activation is computed in fp32 off the first matmul's fp32
    accumulator. ``x`` is (..., Din); weights (Din, Dff) / (Dff, Dout).
    """
    return _mlp_impl(x, w1, b1, w2, b2, activation)


def _mlp_fwd(x, w1, b1, w2, b2, activation):
    return _mlp_impl(x, w1, b1, w2, b2, activation), (x, w1, b1, w2, b2)


def _mlp_bwd(activation, res, g):
    # Default: XLA-recompute VJP. Measured on v5e (scripts/bench_mlp_bwd.py,
    # BENCHMARKS.md round 5): the Pallas backward tiers below reach parity
    # in isolation (3.08-3.11 ms vs 3.12 ms at CLIP-vision batch-256
    # shapes — the backward is COMPUTE-bound, ~116 TF/s effective, so the
    # kernels' byte savings buy nothing) but lose ~5% on the full train
    # step: the opaque custom call blocks XLA from fusing/scheduling the
    # surrounding residual/LN backward ops. Opt in with MMTPU_FUSED_MLP_BWD=1
    # for hardware where the trade flips.
    x, w1, b1, w2, b2 = res
    din = x.shape[-1]
    dout = w2.shape[-1]
    rows = 1
    for dim in x.shape[:-1]:
        rows *= dim
    if os.environ.get("MMTPU_FUSED_MLP_BWD") and fused_mlp_available(
        din, w1.shape[-1], dout
    ):
        acc = _mlp_bwd_acc_pallas(
            x.reshape(rows, din), g.reshape(rows, dout), w1, b1, w2,
            activation,
        )
        if acc is not None:
            dx, dw1_f, dw2_f, db1_f = acc
            g2 = g.reshape(rows, dout)
            return (
                dx.reshape(x.shape),
                dw1_f.astype(w1.dtype),
                db1_f[0].astype(b1.dtype),
                dw2_f.astype(w2.dtype),
                jnp.sum(g2.astype(jnp.float32), axis=0).astype(b2.dtype),
            )
    staged = None
    if os.environ.get("MMTPU_FUSED_MLP_BWD") and fused_mlp_available(
        din, w1.shape[-1], dout
    ):
        staged = _mlp_bwd_pallas(
            x.reshape(rows, din), g.reshape(rows, dout), w1, b1, w2,
            activation,
        )
    if staged is None:
        # weights too large for a useful row block (matches the forward's
        # fallback) or no TPU: XLA-recompute VJP
        _, vjp = jax.vjp(
            lambda *a: _mlp_xla(*a, activation), x, w1, b1, w2, b2
        )
        return vjp(g)
    dx, da, h = staged
    g2 = g.reshape(rows, dout)
    x2 = x.reshape(rows, din)
    # weight/bias grads as two large MXU GEMMs + two column sums off the
    # compact compute-dtype buffers (fp32 accumulation)
    dw1 = jax.lax.dot_general(
        x2, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w1.dtype)
    dw2 = jax.lax.dot_general(
        h, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w2.dtype)
    db1 = jnp.sum(da.astype(jnp.float32), axis=0).astype(b1.dtype)
    db2 = jnp.sum(g2.astype(jnp.float32), axis=0).astype(b2.dtype)
    return dx.reshape(x.shape), dw1, db1, dw2, db2


fused_mlp.defvjp(_mlp_fwd, _mlp_bwd)
