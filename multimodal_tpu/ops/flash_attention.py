"""Pallas TPU flash attention (online-softmax, blockwise).

TPU-native replacement for the reference's reliance on
``F.scaled_dot_product_attention`` (torch flash/mem-efficient CUDA kernels,
reference ``modules/layers/multi_head_attention.py:74``). Forward is a Pallas
kernel tiled for the MXU; backward recomputes attention in XLA (sequences in
this library are short enough that recompute is cheaper than storing probs).

Layout: ``q (B, H, Sq, D)``, ``k/v (B, H, Sk, D)``. Grid is
``(B, H, num_q_blocks, num_k_blocks)`` with the k axis sequential
("arbitrary") carrying running max / denominator / accumulator in VMEM
scratch — the standard online-softmax recurrence, so Sk never materializes
as a full attention matrix in memory.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -1e30


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU backends (tests).
    return jax.default_backend() not in ("tpu", "axon")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, sm_scale, causal, causal_offset, block_q, block_k, bias_ref=None):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Skip fully-masked blocks under causal masking (q rows all before k cols).
    # Causal convention: query i attends key j iff j <= i + causal_offset,
    # with causal_offset = sk - sq (last query aligns with last key).
    should_compute = True
    if causal:
        should_compute = (iq + 1) * block_q - 1 + causal_offset >= ik * block_k

    @pl.when(should_compute)
    def _compute():
        # keep q/k in their storage dtype (bf16) into the MXU — fp32 inputs
        # would halve the systolic-array rate; accumulate in fp32
        q = q_ref[0, 0]                      # (block_q, d)
        k = k_ref[0, 0]                      # (block_k, d)
        v = v_ref[0, 0]                      # (block_k, d)
        # softmax in log2 space: exp(x) = exp2(x * log2 e); exp2 is cheaper
        # on the VPU, so fold log2(e) into the scale once
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * 1.4426950408889634)  # (block_q, block_k) log2-space
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32) * 1.4426950408889634
        if causal:
            row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(row + causal_offset >= col, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, 0:1]                      # (block_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)                     # (block_q, block_k)
        alpha = jnp.exp2(m_prev - m_new)            # (block_q, 1)
        l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        # Guard fully-masked rows (l == 0) against 0/0.
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k"))
def flash_attention_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """Blockwise fused attention. q: (B,H,Sq,D); k,v: (B,H,Sk,D).

    ``bias`` is an additive float mask broadcastable to (B, H, Sq, Sk); pass
    large-negative values for masked positions.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(sk, 8))

    q_p = _pad_to(q, 2, block_q)
    k_p = _pad_to(k, 2, block_k)
    v_p = _pad_to(v, 2, block_k)
    sq_p, sk_p = q_p.shape[2], k_p.shape[2]

    needs_k_pad_mask = sk_p != sk
    if bias is not None or needs_k_pad_mask:
        if bias is None:
            bias = jnp.zeros((1, 1, 1, sk), dtype=jnp.float32)
        bias = jnp.broadcast_to(bias, (b, h, sq, sk)).astype(jnp.float32)
        bias = _pad_to(_pad_to(bias, 3, block_k, DEFAULT_MASK_VALUE), 2, block_q)

    causal_offset = sk - sq
    grid = (b, h, sq_p // block_q, sk_p // block_k)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, causal=causal,
        causal_offset=causal_offset, block_q=block_q, block_k=block_k,
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
    ]
    args = [q_p, k_p, v_p]
    if bias is not None:
        def kernel_with_bias(q_ref, k_ref, v_ref, b_ref, o_ref, m_scr, l_scr, acc_scr):
            _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                          sm_scale=sm_scale, causal=causal,
                          causal_offset=causal_offset, block_q=block_q,
                          block_k=block_k, bias_ref=b_ref)
        kernel = kernel_with_bias
        in_specs.append(
            pl.BlockSpec((1, 1, block_q, block_k), lambda b_, h_, iq, ik: (b_, h_, iq, ik))
        )
        args.append(bias)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    return out[:, :, :sq, :]


def _xla_attention(q, k, v, bias, causal, sm_scale):
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, bias=None, causal=False, sm_scale=None):
    """Differentiable fused attention: Pallas forward, XLA-recompute backward."""
    return flash_attention_forward(q, k, v, bias, causal=causal, sm_scale=sm_scale)


def _fa_fwd(q, k, v, bias, causal, sm_scale):
    return flash_attention_forward(q, k, v, bias, causal=causal, sm_scale=sm_scale), (q, k, v, bias)


def _fa_bwd(causal, sm_scale, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _xla_attention(q_, k_, v_, b_, causal, sm_scale), q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    if bias is None:
        dbias = None
    return dq, dk, dv, dbias


flash_attention.defvjp(_fa_fwd, _fa_bwd)
