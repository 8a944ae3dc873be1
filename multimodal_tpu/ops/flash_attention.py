"""Pallas TPU flash attention (online-softmax, blockwise, fwd + bwd).

TPU-native replacement for the reference's reliance on
``F.scaled_dot_product_attention`` (torch flash/mem-efficient CUDA kernels,
reference ``modules/layers/multi_head_attention.py:74``).

Forward is a Pallas kernel tiled for the MXU with the online-softmax
recurrence; the differentiable path also emits the per-row logsumexp so the
backward can run as two more Pallas kernels (dq, and dk/dv) that recompute
probabilities blockwise from (q, k, lse) — the (Sq, Sk) logits matrix never
materializes in either direction, so training-mode attention at 8k+ sequence
fits in HBM.

Masking, in order of preference:
  - ``causal=True``: triangular masking fused into the kernels (blocks that
    are fully masked are skipped entirely).
  - ``q_segment_ids``/``kv_segment_ids``: per-position int32 ids (``(B, Sq)``
    / ``(B, Sk)``, ids >= 0); position pairs attend iff their ids match.
    This covers padded BERT-style batches (pad = one id, real tokens =
    another — or per-sequence ids for sequence packing) and keeps BOTH the
    forward and the blockwise Pallas backward, at O(S) mask storage instead
    of the O(S^2) bias. This is the path long-context padded training takes.
  - ``bias``: an additive float bias broadcastable to (B, H, Sq, Sk), which
    COMPOSES with segment ids and causal. Broadcast biases (ALiBi-style
    (1, H, 1, Sk), per-batch (B, 1, Sq, Sk), row biases) are kept at their
    broadcast shape end to end — block specs pin degenerate dims to block 0
    and the in-kernel add broadcasts, so an O(S) bias costs O(S) HBM in both
    directions. The backward stays blockwise (dq / dk-dv kernels recompute
    probabilities with the bias folded in); the bias gradient, only when the
    caller differentiates the bias (symbolic-zeros tracking), is a third
    blockwise kernel whose (Sq, Sk) output IS the gradient, reduced back to
    the broadcast shape.

``flash_attention_lse`` additionally returns the per-row logsumexp and is
differentiable in BOTH outputs — the building block for ring/context-parallel
attention (``parallel/context_parallel.py``), where per-device partial
results merge in lse space across ppermute steps.

Block sizes default to 1024x1024 — measured fastest on v5e for d=64/128
(2048 exceeds the 16M scoped-vmem limit; 512 leaves ~2x on the table at 4k
sequence; scripts/bench_flash_sweep.py).

Layout: ``q (B, H, Sq, D)``, ``k/v (B, H, Sk, D)``. Grids put the contracted
sequence axis last with "arbitrary" semantics carrying running statistics /
accumulators in VMEM scratch. LSE/delta ride as (B, H, Sq, 128) buffers
(TPU lane width, same layout the XLA team's kernel uses); segment ids ride
as (B, Sq, 128) / (B, 8, Sk) broadcasts so every in-kernel compare is 2-D.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -1e30
LOG2E = 1.4426950408889634
LANES = 128
SUBLANES = 8
_SEG_PAD = -1  # padded positions; never matches a real (>= 0) segment id


def _dot_precision(dtype) -> jax.lax.Precision:
    """MXU precision for kernel dots, pinned per input dtype so a global
    jax_default_matmul_precision=highest can't force fp32-emulated passes on
    bf16 operands (Mosaic rejects that) and fp32 inputs keep full precision."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU backends (tests).
    return jax.default_backend() not in ("tpu", "axon")


def _seg_mask(q_seg_ref, kv_seg_ref):
    """(block_q, block_k) visibility from the 2-D segment-id blocks."""
    q_seg = q_seg_ref[0][:, 0:1]     # (block_q, 1)
    kv_seg = kv_seg_ref[0][0:1, :]   # (1, block_k)
    return q_seg == kv_seg


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  sm_scale, causal, causal_offset, block_q, block_k,
                  sq, sk, precision, bias_ref=None, lse_ref=None,
                  q_seg_ref=None, kv_seg_ref=None):
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
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        ) * (sm_scale * LOG2E)               # (block_q, block_k) log2-space
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32) * LOG2E
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        if causal:
            s = jnp.where(row + causal_offset >= col, s, DEFAULT_MASK_VALUE)
        if q_seg_ref is not None:
            s = jnp.where(_seg_mask(q_seg_ref, kv_seg_ref), s, DEFAULT_MASK_VALUE)
        if sk % block_k != 0:
            s = jnp.where(col < sk, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, 0:1]                      # (block_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)                     # (block_q, block_k)
        alpha = jnp.exp2(m_prev - m_new)            # (block_q, 1)
        l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=precision,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        # Guard fully-masked rows (l == 0) against 0/0.
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            # log2-space logsumexp: p_j = exp2(s2_j - lse2) reproduces the
            # forward probabilities exactly in the backward kernels. Rows
            # with no visible key keep lse2 = -inf (flows to zero weight in
            # ring merges).
            lse2 = jnp.where(
                l == 0.0, -jnp.inf, m_scr[:, 0:1] + jnp.log2(l_safe)
            )
            lse_ref[0, 0] = jnp.broadcast_to(lse2, lse_ref[0, 0].shape)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


def _broadcast_segments(q_segment_ids, kv_segment_ids, b, block_q, block_k):
    """Lay segment ids out for 2-D in-kernel compares: q ids as
    (B, Sq_p, LANES), kv ids as (B, SUBLANES, Sk_p); pad with _SEG_PAD."""
    q_seg = _pad_to(q_segment_ids.astype(jnp.int32), 1, block_q, _SEG_PAD)
    kv_seg = _pad_to(kv_segment_ids.astype(jnp.int32), 1, block_k, _SEG_PAD)
    q_seg = jnp.broadcast_to(q_seg[:, :, None], (b, q_seg.shape[1], LANES))
    kv_seg = jnp.broadcast_to(kv_seg[:, None, :], (b, SUBLANES, kv_seg.shape[1]))
    return q_seg, kv_seg


def _q_seg_spec(block_q, transposed_grid=False):
    if transposed_grid:
        return pl.BlockSpec((1, block_q, LANES), lambda b_, h_, ik, iq: (b_, iq, 0))
    return pl.BlockSpec((1, block_q, LANES), lambda b_, h_, iq, ik: (b_, iq, 0))


def _prep_bias(bias, block_q, block_k):
    """Pad a (possibly broadcast) additive bias for blockwise access WITHOUT
    materializing the broadcast: size-1 batch/head/row/col dims stay size 1
    and the block spec's index map pins them to 0 (the kernel's in-block add
    broadcasts). Only non-degenerate seq dims are padded; padded key columns
    are masked by the kernels' ``col < sk`` guard, so the pad value is moot."""
    bias = bias.astype(jnp.float32)
    if bias.ndim != 4:
        raise ValueError(f"bias must be 4-d broadcastable, got {bias.shape}")
    if bias.shape[2] > 1:
        bias = _pad_to(bias, 2, block_q)
    if bias.shape[3] > 1:
        bias = _pad_to(bias, 3, block_k, DEFAULT_MASK_VALUE)
    return bias


def _bias_spec(bias_shape, block_q, block_k, transposed_grid=False):
    """BlockSpec for a padded broadcast bias: block dims shrink to 1 on
    degenerate axes and the index map pins them to block 0."""
    bb, bh, bsq, bsk = bias_shape
    bq = block_q if bsq > 1 else 1
    bk = block_k if bsk > 1 else 1

    if transposed_grid:
        def im(b_, h_, ik, iq):
            return (b_ if bb > 1 else 0, h_ if bh > 1 else 0,
                    iq if bsq > 1 else 0, ik if bsk > 1 else 0)
    else:
        def im(b_, h_, iq, ik):
            return (b_ if bb > 1 else 0, h_ if bh > 1 else 0,
                    iq if bsq > 1 else 0, ik if bsk > 1 else 0)

    return pl.BlockSpec((1, 1, bq, bk), im)


def _kv_seg_spec(block_k, transposed_grid=False):
    if transposed_grid:
        return pl.BlockSpec((1, SUBLANES, block_k), lambda b_, h_, ik, iq: (b_, 0, ik))
    return pl.BlockSpec((1, SUBLANES, block_k), lambda b_, h_, iq, ik: (b_, 0, ik))


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "return_lse"),
)
def flash_attention_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    return_lse: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
):
    """Blockwise fused attention. q: (B,H,Sq,D); k,v: (B,H,Sk,D).

    ``bias`` is an additive float mask broadcastable to (B, H, Sq, Sk); pass
    large-negative values for masked positions. ``q_segment_ids`` /
    ``kv_segment_ids`` ((B, Sq) / (B, Sk) int32, ids >= 0) restrict
    attention to matching ids at O(S) storage. With ``return_lse`` the
    log2-space per-row logsumexp (B, H, Sq_padded, 128) is also returned
    (used by the Pallas backward and ring merges).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("pass both q_segment_ids and kv_segment_ids or neither")
    if bias is not None and bias.ndim >= 2 and bias.shape[-2] > 1 and bias.shape[-1] > 1:
        # full-tile (block_q, block_k) bias operand: 1024^2 fp32 tiles push
        # the kernel over the 16M scoped-vmem limit; broadcast biases (row /
        # column / ALiBi) keep the big blocks
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(sk, 8))

    q_p = _pad_to(q, 2, block_q)
    k_p = _pad_to(k, 2, block_k)
    v_p = _pad_to(v, 2, block_k)
    sq_p, sk_p = q_p.shape[2], k_p.shape[2]

    if bias is not None:
        if bias.ndim < 4:
            bias = jnp.expand_dims(bias, tuple(range(4 - bias.ndim)))
        bias = _prep_bias(bias, block_q, block_k)

    causal_offset = sk - sq
    grid = (b, h, sq_p // block_q, sk_p // block_k)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
    ]
    args = [q_p, k_p, v_p]
    if bias is not None:
        in_specs.append(_bias_spec(bias.shape, block_q, block_k))
        args.append(bias)
    has_segments = q_segment_ids is not None
    if has_segments:
        q_seg, kv_seg = _broadcast_segments(
            q_segment_ids, kv_segment_ids, b, block_q, block_k
        )
        in_specs.append(_q_seg_spec(block_q))
        in_specs.append(_kv_seg_spec(block_k))
        args.extend([q_seg, kv_seg])

    out_shapes = [jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0))]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b, h, sq_p, LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, block_q, LANES), lambda b_, h_, iq, ik: (b_, h_, iq, 0))
        )

    def kernel(*refs):
        q_ref, k_ref, v_ref = refs[:3]
        idx = 3
        bias_ref = None
        if bias is not None:
            bias_ref = refs[idx]
            idx += 1
        q_seg_ref = kv_seg_ref = None
        if has_segments:
            q_seg_ref, kv_seg_ref = refs[idx:idx + 2]
            idx += 2
        o_ref = refs[idx]
        idx += 1
        lse_ref = refs[idx] if return_lse else None
        idx += 1 if return_lse else 0
        m_scr, l_scr, acc_scr = refs[idx:idx + 3]
        _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                      sm_scale=sm_scale, causal=causal,
                      causal_offset=causal_offset, block_q=block_q,
                      block_k=block_k, sq=sq, sk=sk,
                      precision=_dot_precision(q.dtype),
                      bias_ref=bias_ref, lse_ref=lse_ref,
                      q_seg_ref=q_seg_ref, kv_seg_ref=kv_seg_ref)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    out = outs[0][:, :, :sq, :]
    if return_lse:
        return out, outs[1]
    return out


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_scr, *, sm_scale, causal, causal_offset,
                   block_q, block_k, sq, sk, precision,
                   q_seg_ref=None, kv_seg_ref=None, bias_ref=None):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    should_compute = True
    if causal:
        should_compute = (iq + 1) * block_q - 1 + causal_offset >= ik * block_k

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]          # (block_q, 1) log2-space
        delta = delta_ref[0, 0][:, 0:1]      # (block_q, 1)

        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        ) * (sm_scale * LOG2E)
        if bias_ref is not None:
            s2 = s2 + bias_ref[0, 0].astype(jnp.float32) * LOG2E
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = col < sk
        if causal:
            valid = jnp.logical_and(valid, row + causal_offset >= col)
        if q_seg_ref is not None:
            valid = jnp.logical_and(valid, _seg_mask(q_seg_ref, kv_seg_ref))
        if sq % block_q != 0:
            valid = jnp.logical_and(valid, row < sq)
        p = jnp.where(valid, jnp.exp2(s2 - lse), 0.0)  # (block_q, block_k)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )                                              # (block_q, block_k)
        ds = p * (dp - delta)                          # d/ds in natural space
        dq_scr[:] = dq_scr[:] + jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32,
            precision=precision,
        ) * sm_scale

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, sm_scale, causal,
                    causal_offset, block_q, block_k, sq, sk, precision,
                    q_seg_ref=None, kv_seg_ref=None, bias_ref=None):
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    should_compute = True
    if causal:
        should_compute = (iq + 1) * block_q - 1 + causal_offset >= ik * block_k

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]
        delta = delta_ref[0, 0][:, 0:1]

        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        ) * (sm_scale * LOG2E)
        if bias_ref is not None:
            s2 = s2 + bias_ref[0, 0].astype(jnp.float32) * LOG2E
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = jnp.logical_and(row < sq, col < sk)
        if causal:
            valid = jnp.logical_and(valid, row + causal_offset >= col)
        if q_seg_ref is not None:
            valid = jnp.logical_and(valid, _seg_mask(q_seg_ref, kv_seg_ref))
        p = jnp.where(valid, jnp.exp2(s2 - lse), 0.0)

        # dv += p^T @ do   (contract the q-block dim)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        ds = p * (dp - delta)
        # dk += ds^T @ q * scale
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * sm_scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dbias_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dbias_ref, *, sm_scale, causal, causal_offset,
                      block_q, block_k, sq, sk, precision,
                      q_seg_ref=None, kv_seg_ref=None, bias_ref=None):
    """dbias block = ds = p * (dp - delta): each (iq, ik) grid cell writes its
    own (block_q, block_k) tile once — only instantiated when the caller
    actually differentiates the bias (otherwise the whole pallas_call is
    dead code and XLA removes it)."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    should_compute = True
    if causal:
        should_compute = (iq + 1) * block_q - 1 + causal_offset >= ik * block_k

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]
        delta = delta_ref[0, 0][:, 0:1]

        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        ) * (sm_scale * LOG2E)
        if bias_ref is not None:
            s2 = s2 + bias_ref[0, 0].astype(jnp.float32) * LOG2E
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = jnp.logical_and(row < sq, col < sk)
        if causal:
            valid = jnp.logical_and(valid, row + causal_offset >= col)
        if q_seg_ref is not None:
            valid = jnp.logical_and(valid, _seg_mask(q_seg_ref, kv_seg_ref))
        p = jnp.where(valid, jnp.exp2(s2 - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        dbias_ref[0, 0] = (p * (dp - delta)).astype(dbias_ref.dtype)

    @pl.when(jnp.logical_not(should_compute))
    def _skip():
        dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])


def _flash_backward(q, k, v, out, lse, do, *, causal, sm_scale,
                    block_q=1024, block_k=1024,
                    q_segment_ids=None, kv_segment_ids=None,
                    dlse=None, bias=None, need_dbias=False):
    """Blockwise dq/dk/dv: two Pallas kernels recomputing p from (q, k, lse).

    No (Sq, Sk) buffer is ever materialized — this is the FlashAttention-2
    backward. ``dlse`` is an optional (B, H, Sq) cotangent for the log2-space
    logsumexp output (ring-attention merges differentiate through lse); its
    contribution folds into delta exactly: ds = p * (dp - delta + dlse_nat),
    so delta' = delta - dlse * log2(e) and the kernels run unchanged.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    full_bias_tile = (
        bias is not None and bias.shape[-2] > 1 and bias.shape[-1] > 1
    )
    if full_bias_tile or need_dbias:
        # a full-tile bias operand or a (block_q, block_k) dbias output per
        # grid cell at 1024^2 fp32 blows the 16M scoped-vmem limit; 512^2
        # fits. Broadcast biases without a dbias keep the big blocks.
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(sk, 8))

    q_p = _pad_to(q, 2, block_q)
    do_p = _pad_to(do, 2, block_q)
    o_p = _pad_to(out, 2, block_q)
    k_p = _pad_to(k, 2, block_k)
    v_p = _pad_to(v, 2, block_k)
    sq_p, sk_p = q_p.shape[2], k_p.shape[2]
    # lse from forward is already (b, h, sq_p, LANES) for matching block_q;
    # re-pad defensively if the caller passed a differently-padded buffer.
    lse_p = _pad_to(lse, 2, block_q)[:, :, :sq_p]

    # delta_i = rowsum(dO_i * O_i): O(S*D) elementwise, fine in XLA
    delta = jnp.sum(do_p.astype(jnp.float32) * o_p.astype(jnp.float32), axis=-1)
    if dlse is not None:
        # lse cotangent: dlse2/ds_ij = log2e * p_ij, so ds gains
        # p * dlse2 * log2e — absorbed by delta' = delta - dlse2 * log2e.
        delta = delta - _pad_to(dlse.astype(jnp.float32), 2, block_q) * LOG2E
    delta_p = jnp.broadcast_to(delta[..., None], (*delta.shape, LANES))

    has_segments = q_segment_ids is not None
    if has_segments:
        q_seg, kv_seg = _broadcast_segments(
            q_segment_ids, kv_segment_ids, b, block_q, block_k
        )
    has_bias = bias is not None
    if has_bias:
        bias_p = _prep_bias(bias, block_q, block_k)

    causal_offset = sk - sq
    common = dict(sm_scale=sm_scale, causal=causal, causal_offset=causal_offset,
                  block_q=block_q, block_k=block_k, sq=sq, sk=sk,
                  precision=_dot_precision(q.dtype))

    def _wrap(base_kernel, n_out_and_scratch):
        """Route the optional trailing seg/bias refs into keyword slots: the
        pallas_call sees inputs [fixed..., segs?, bias?] then outputs/scratch."""
        def kernel(*refs):
            fixed = refs[:6]
            idx = 6
            extra = {}
            if has_segments:
                extra["q_seg_ref"], extra["kv_seg_ref"] = refs[idx:idx + 2]
                idx += 2
            if has_bias:
                extra["bias_ref"] = refs[idx]
                idx += 1
            base_kernel(*fixed, *refs[idx:idx + n_out_and_scratch],
                        **extra, **common)
        return kernel

    def _extra(transposed_grid):
        specs, args = [], []
        if has_segments:
            specs += [_q_seg_spec(block_q, transposed_grid),
                      _kv_seg_spec(block_k, transposed_grid)]
            args += [q_seg, kv_seg]
        if has_bias:
            specs.append(_bias_spec(bias_p.shape, block_q, block_k, transposed_grid))
            args.append(bias_p)
        return specs, args

    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0))
    k_spec = pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0))
    lse_spec = pl.BlockSpec((1, 1, block_q, LANES), lambda b_, h_, iq, ik: (b_, h_, iq, 0))

    extra_specs, extra_args = _extra(transposed_grid=False)
    dq_in_specs = [q_spec, k_spec, k_spec, q_spec, lse_spec, lse_spec] + extra_specs
    dq_args = [q_p, k_p, v_p, do_p, lse_p, delta_p] + extra_args

    dq = pl.pallas_call(
        _wrap(_bwd_dq_kernel, 2),
        grid=(b, h, sq_p // block_q, sk_p // block_k),
        in_specs=dq_in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*dq_args)

    # dk/dv grid transposes the sequence axes: k blocks parallel, q sequential
    kq_q_spec = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, ik, iq: (b_, h_, iq, 0))
    kq_k_spec = pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ik, iq: (b_, h_, ik, 0))
    kq_lse_spec = pl.BlockSpec((1, 1, block_q, LANES), lambda b_, h_, ik, iq: (b_, h_, iq, 0))

    extra_specs_t, extra_args_t = _extra(transposed_grid=True)
    dkv_in_specs = (
        [kq_q_spec, kq_k_spec, kq_k_spec, kq_q_spec, kq_lse_spec, kq_lse_spec]
        + extra_specs_t
    )
    dkv_args = [q_p, k_p, v_p, do_p, lse_p, delta_p] + extra_args_t

    dk, dv = pl.pallas_call(
        _wrap(_bwd_dkv_kernel, 4),
        grid=(b, h, sk_p // block_k, sq_p // block_q),
        in_specs=dkv_in_specs,
        out_specs=[kq_k_spec, kq_k_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*dkv_args)

    dq, dk, dv = dq[:, :, :sq, :], dk[:, :, :sk, :], dv[:, :, :sk, :]
    if not need_dbias:
        return dq, dk, dv

    # dbias: its own pallas_call so that when the bias cotangent is unused
    # the call is dead code — the (Sq, Sk) write only exists for callers
    # that differentiate a bias.
    dbias_spec = pl.BlockSpec(
        (1, 1, block_q, block_k), lambda b_, h_, iq, ik: (b_, h_, iq, ik)
    )
    dbias_full = pl.pallas_call(
        _wrap(_bwd_dbias_kernel, 1),
        grid=(b, h, sq_p // block_q, sk_p // block_k),
        in_specs=dq_in_specs,
        out_specs=dbias_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, sk_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*dq_args)[:, :, :sq, :sk]

    # reduce over the bias's broadcast dims back to its original shape
    bias_shape = bias.shape
    reduce_axes = tuple(
        i for i in range(4)
        if bias_shape[i] == 1 and dbias_full.shape[i] > 1
    )
    dbias = jnp.sum(dbias_full, axis=reduce_axes, keepdims=True)
    return dq, dk, dv, dbias.reshape(bias_shape).astype(bias.dtype)


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
def flash_attention(q, k, v, bias=None, causal=False, sm_scale=None,
                    q_segment_ids=None, kv_segment_ids=None):
    """Differentiable fused attention: Pallas forward AND blockwise
    FlashAttention-2 backward on EVERY path — plain / causal / segment-id
    masked / additive-bias (broadcast biases like ALiBi stay at their
    broadcast shape end to end), and bias composes with segment ids. The
    bias gradient, when a caller actually differentiates the bias
    (``symbolic_zeros`` tells us), is one extra blockwise kernel whose
    (Sq, Sk) output is the gradient itself; otherwise no quadratic buffer
    exists anywhere in the backward."""
    return flash_attention_forward(
        q, k, v, bias, causal=causal, sm_scale=sm_scale,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
    )


def _primal(x):
    # with symbolic_zeros=True the fwd sees CustomVJPPrimal(value, perturbed)
    return x.value if hasattr(x, "perturbed") else x


def _fa_fwd(q, k, v, bias, causal, sm_scale, q_segment_ids, kv_segment_ids):
    bias_perturbed = bool(getattr(bias, "perturbed", False))
    q, k, v, bias = _primal(q), _primal(k), _primal(v), _primal(bias)
    q_segment_ids = _primal(q_segment_ids)
    kv_segment_ids = _primal(kv_segment_ids)
    out, lse = flash_attention_forward(
        q, k, v, bias, causal=causal, sm_scale=sm_scale, return_lse=True,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
    )
    return out, (q, k, v, bias, out, lse, q_segment_ids, kv_segment_ids,
                 bias_perturbed)


def _fa_bwd(causal, sm_scale, res, g):
    q, k, v, bias, out, lse, q_seg, kv_seg, bias_perturbed = res
    if hasattr(g, "aval") and type(g).__name__ == "SymbolicZero":
        g = jnp.zeros(g.aval.shape, g.aval.dtype)
    need_dbias = bias is not None and bias_perturbed
    grads = _flash_backward(
        q, k, v, out, lse, g, causal=causal, sm_scale=sm_scale,
        q_segment_ids=q_seg, kv_segment_ids=kv_seg,
        bias=bias, need_dbias=need_dbias,
    )
    if need_dbias:
        dq, dk, dv, dbias = grads
    else:
        dq, dk, dv = grads
        dbias = None
    return dq, dk, dv, dbias, None, None


flash_attention.defvjp(_fa_fwd, _fa_bwd, symbolic_zeros=True)


# ---------------------------------------------------------------------------
# LSE-returning differentiable attention — the ring/context-parallel block.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_lse(q, k, v, causal=False, sm_scale=None):
    """Fused attention returning ``(out, lse2)`` where ``lse2 (B, H, Sq)`` is
    the log2-space per-row logsumexp of the scaled logits. Differentiable in
    BOTH outputs (the lse cotangent folds into the backward's delta), which
    is what ring attention needs: per-device partial (out, lse) pairs merge
    in lse space across ppermute steps and gradients flow through the merge
    weights. Rows with no visible key return lse2 = -inf and out = 0."""
    out, lse = flash_attention_forward(
        q, k, v, None, causal=causal, sm_scale=sm_scale, return_lse=True
    )
    return out, lse[:, :, : q.shape[2], 0]


def _fa_lse_fwd(q, k, v, causal, sm_scale):
    out, lse = flash_attention_forward(
        q, k, v, None, causal=causal, sm_scale=sm_scale, return_lse=True
    )
    lse_rows = lse[:, :, : q.shape[2], 0]
    return (out, lse_rows), (q, k, v, out, lse)


def _fa_lse_bwd(causal, sm_scale, res, g):
    q, k, v, out, lse = res
    g_out, g_lse = g
    # Fully-masked rows carry lse = -inf with zero output; their cotangents
    # must not poison delta (0 * inf): zero them explicitly.
    g_lse = jnp.where(jnp.isfinite(lse[:, :, : q.shape[2], 0]), g_lse, 0.0)
    dq, dk, dv = _flash_backward(
        q, k, v, out, lse, g_out, causal=causal, sm_scale=sm_scale, dlse=g_lse
    )
    return dq, dk, dv


flash_attention_lse.defvjp(_fa_lse_fwd, _fa_lse_bwd)
