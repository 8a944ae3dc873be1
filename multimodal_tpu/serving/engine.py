"""Continuous-batching inference engine for causal LMs.

Production serving layer — no reference counterpart (the reference's only
decode surface is the offline ``GenerationUtil.sample`` loop,
``utils/generate.py:61``); the task spec makes production serving a
first-class goal of the TPU rebuild.

TPU-native design (Orca-style continuous batching under XLA's
static-shape contract):

  - A fixed pool of ``n_slots`` decode slots. The per-layer KV cache is one
    preallocated ``(n_slots, heads, max_len, head_dim)`` buffer pair; a slot
    is a row. No paging indirection: on TPU, HBM is flat and the win of
    paged attention (fragmentation) is bought here by bucketed admission
    instead, keeping every decode step a single dense batched matmul.
  - One compiled decode step serves ALL slots every tick regardless of how
    many are live — each row carries its own sequence offset (the
    per-row ``cache_index`` scatter in
    ``modules/layers/multi_head_attention.py``) and its own valid-prefix
    mask, so requests of different lengths decode in lockstep and finished
    slots are re-admitted without recompiling anything.
  - Prefill is bucketed by prompt length (powers of two by default): one
    compiled prefill program per bucket, each a plain causal forward whose
    keys/values are block-written into the slot row. Prefill runs when a
    request is admitted; decode of other slots continues next tick —
    admission never flushes the batch.
  - Sampling happens on device (greedy / temperature with per-slot top-k
    and nucleus vectors), and decode runs ``decode_steps`` ticks per host
    call (``lax.scan`` multi-step scheduling): only
    ``decode_steps x n_slots`` sampled token ids cross back to the host
    per call, amortizing dispatch latency — the difference between ~500
    and ~4,000 tok/s when the host link is a thin tunnel
    (scripts/bench_serving.py). Admission happens between calls, so a
    larger ``decode_steps`` trades a little slot occupancy for per-token
    overhead.

On top of that core loop: prefix caching (``register_prefix``), chunked
prefill interleaved with decode (``prefill_chunk``), an int8 KV cache
with a Pallas in-VMEM dequant decode kernel (``cache_dtype='int8'``),
multi-LoRA batched adapters (``adapters=``), grouped-query caches (the
model's ``n_kv_head``), unbounded sliding-window streaming
(``window=``/``sinks=``), per-request latency stats, and an HTTP
front-end (``serving/http_server.py``).

The engine is generic over any flax module with the ``LongContextLM``
decode surface: ``apply(params, tokens, positions=, past_key_values=,
cache_index=, attention_mask=, use_cache=True) -> (logits, kvs)`` —
``serving/video_gpt_server.py`` adapts the MUGEN/VideoGPT generator onto
it.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.ops.kv_cache import (
    QuantizedKV,
    is_quantized_kv,
    quantize_kv,
    quantized_kv_zeros,
)
from multimodal_tpu.serving.multi_lora import (
    build_adapter_table,
    multi_lora_scope,
)
from multimodal_tpu.utils.generate import filter_logits_per_row


def _kv_set_rows(cache, new, slots, bucket: int):
    """Write ``new`` (b, h, bucket, d) into rows ``slots[: b]`` positions
    ``[0, bucket)`` of a dense or int8 cache tensor."""
    if is_quantized_kv(cache):
        q, scale = quantize_kv(new)
        return QuantizedKV(
            q=cache.q.at[slots, :, :bucket].set(q),
            scale=cache.scale.at[slots, :, :bucket].set(scale),
        )
    return cache.at[slots, :, :bucket].set(new.astype(cache.dtype))


def _kv_rows_like(cache, b: int, prefix_kv, plen: int):
    """Fresh (b, ...) rows in ``cache``'s format with ``prefix_kv``
    (1, h, plen, d) broadcast into positions [0, plen)."""
    if is_quantized_kv(cache):
        shape = (b,) + cache.q.shape[1:]
        q, scale = quantize_kv(prefix_kv)
        return QuantizedKV(
            q=jnp.zeros(shape, jnp.int8).at[:, :, :plen].set(q),
            scale=jnp.zeros(shape[:-1], jnp.float32)
            .at[:, :, :plen].set(scale),
        )
    return (
        jnp.zeros((b,) + cache.shape[1:], cache.dtype)
        .at[:, :, :plen].set(prefix_kv.astype(cache.dtype))
    )


def _kv_scatter_rows(cache, rows, slots):
    """Overwrite whole rows ``slots`` of the cache with ``rows`` (same
    format)."""
    if is_quantized_kv(cache):
        return QuantizedKV(
            q=cache.q.at[slots].set(rows.q),
            scale=cache.scale.at[slots].set(rows.scale),
        )
    return cache.at[slots].set(rows)


def _kv_gather_rows(cache, slots):
    """Rows ``slots`` of a dense or int8 cache tensor (same format)."""
    if is_quantized_kv(cache):
        return QuantizedKV(q=cache.q[slots], scale=cache.scale[slots])
    return cache[slots]


def _kv_take_positions(rows, idx):
    """Positions ``idx`` (b, C) of rows (b, h, L, d) -> (b, h, C, d)."""
    if is_quantized_kv(rows):
        return QuantizedKV(
            q=_kv_take_positions(rows.q, idx),
            scale=jax.vmap(lambda r, i: r[:, i])(rows.scale, idx),
        )
    return jax.vmap(lambda r, i: r[:, i])(rows, idx)


def _kv_put_positions(cache, new, slots, idx):
    """Scatter ``new`` (b, h, C, d) into ``cache`` (N, h, L, d) at rows
    ``slots`` (b,), positions ``idx`` (b, C). The two advanced index arrays
    land in front, so values transpose to (b, C, h, ...)."""
    if is_quantized_kv(cache):
        return QuantizedKV(
            q=_kv_put_positions(cache.q, new.q, slots, idx),
            scale=cache.scale.at[slots[:, None], :, idx].set(
                new.scale.transpose(0, 2, 1)
            ),
        )
    return cache.at[slots[:, None], :, idx].set(new.transpose(0, 2, 1, 3))


@dataclass
class Request:
    """One generation request.

    ``on_token(token_id)`` — optional streaming callback, invoked from the
    host loop as each sampled token is collected (tokens stream out
    mid-generation; a served client does not wait for completion).

    ``prefix`` — name of a prefix registered with
    ``InferenceEngine.register_prefix``; its precomputed KV rows are copied
    into the slot and only ``prompt`` (the suffix after the prefix) is
    prefilled — the shared-system-prompt optimization.

    ``adapter`` — name of a LoRA adapter the engine was built with
    (``adapters=``); this request's rows apply that adapter's factors in
    every adapted matmul while sharing the batch with other adapters
    (``serving/multi_lora.py``). ``None`` = the base model.

    ``conditioning`` — per-request static conditioning pytree (no batch
    dim), e.g. an image's pooled tokens for cross-attention captioning.
    Required iff the engine was built with ``conditioning_spec``; the
    engine scatters it into the slot's row of a resident buffer and passes
    the gathered rows to every model call as ``conditioning=``
    (``serving/caption_server.py``).

    ``kv_prefix`` — per-request PRECOMPUTED KV rows seeding cache
    positions ``[0, kv_prefix_len)`` of the slot: a tuple over layers of
    ``(k, v)`` arrays shaped ``(heads, kv_prefix_len, head_dim)``.
    Required iff the engine was built with ``kv_prefix_len``. This is the
    per-request generalization of ``register_prefix`` — the mechanism for
    encoder-decoder models whose conditioning enters generation as primed
    self-attention state (BLIP-2's image-conditioned query tokens,
    ``serving/blip2_caption_server.py``); the prompt prefills as a suffix
    on top and decode attends the seeded rows through the ordinary
    valid-prefix mask.
    """

    prompt: Sequence[int]
    max_new_tokens: int
    temperature: float = 0.0  # 0 = greedy
    # per-request sampling controls (None = the engine's defaults); both
    # run on device, vectorized per slot (utils/generate.py
    # filter_logits_per_row)
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    eos_id: Optional[int] = None
    request_id: Optional[Any] = None
    on_token: Optional[Any] = None
    prefix: Optional[str] = None
    adapter: Optional[str] = None
    conditioning: Optional[Any] = None
    kv_prefix: Optional[Sequence[Tuple[Any, Any]]] = None
    # called once with the finished RequestOutput when the slot retires
    on_finish: Optional[Any] = None


@dataclass
class RequestOutput:
    request_id: Optional[Any]
    prompt_len: int
    tokens: List[int] = field(default_factory=list)
    finish_reason: str = ""  # "eos" | "length"
    # latency breakdown (host wall-clock seconds; 0.0 until reached)
    queue_time: float = 0.0    # submit -> admission
    prefill_time: float = 0.0  # admission -> first token
    decode_time: float = 0.0   # first token -> finish

    @property
    def decode_tokens_per_sec(self) -> float:
        n = len(self.tokens) - 1
        return n / self.decode_time if n > 0 and self.decode_time > 0 else 0.0


@dataclass
class _Slot:
    request: Optional[Request] = None
    output: Optional[RequestOutput] = None
    # sequence position the NEXT decode tick writes (== tokens so far)
    pos: int = 0
    last_token: int = 0
    adapter_id: int = 0
    # pending (tokens, start) prompt chunks; non-empty = still prefilling
    chunks: Optional[deque] = None
    admit_t: float = 0.0
    first_t: float = 0.0

    @property
    def free(self) -> bool:
        return self.request is None

    @property
    def prefilling(self) -> bool:
        return self.chunks is not None and len(self.chunks) > 0


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class InferenceEngine:
    """Continuous-batching engine over a fixed slot pool.

    Args:
        model: flax module with the LongContextLM decode surface.
        params: its variables.
        n_slots: decode batch width (max concurrent requests).
        max_len: per-slot KV capacity; every request needs
            ``len(prompt) + max_new_tokens <= max_len``.
        n_layer/n_head/head_dim: cache geometry (default: read off
            ``model``'s attributes).
        prefill_buckets: compiled prompt lengths; a prompt pads up to the
            next bucket. Defaults to powers of two up to ``max_len``.
        cache_dtype: KV cache storage dtype (bf16 halves HBM traffic).
        top_k: optional device-side top-k applied when temperature > 0.
        decode_steps: decode ticks fused per host call (multi-step
            scheduling); admission happens between calls.
        prefill_batch: admissions prefilled together in one device call
            (same length bucket); padding rows land in a trash cache row.
        seed: sampling PRNG seed.
        adapters: optional ``{name: lora_tree}`` of LoRA adapters
            (``training/lora.py:lora_init`` trees over ``params``); they
            stack into one resident factor table and requests select per
            slot with ``Request(adapter=name)`` (``serving/multi_lora.py``).
        prefill_chunk: when set, prompts longer than this prefill in
            fixed-width chunks through ONE compiled program
            (``_prefill_chunk``) instead of a per-bucket forward — compile
            count and prefill activation memory stop depending on prompt
            length. Chunked rows batch chunk-synchronously across
            requests.
        conditioning_spec: per-request conditioning geometry — a pytree of
            ``jax.ShapeDtypeStruct`` (or arrays, used for shape/dtype only)
            WITHOUT the batch dim. The engine keeps one resident buffer per
            leaf with ``n_slots + 1`` rows, scatters each admitted
            request's ``Request.conditioning`` into its slot row, and
            passes the live rows to the model as ``conditioning=`` in
            every prefill/decode call. This is how encoder-decoder /
            cross-attention models (image captioners) ride the engine:
            the conditioning row IS the per-request encoder state.
        kv_prefix_len: when set, every request must carry
            ``Request.kv_prefix`` — precomputed per-request KV rows (one
            ``(heads, kv_prefix_len, head_dim)`` pair per layer) seeded
            into cache positions ``[0, kv_prefix_len)`` at admission;
            prompts prefill from that offset. The per-request analog of
            ``register_prefix``, for models whose conditioning lives in
            primed self-attention state (BLIP-2 query tokens).
    """

    def __init__(
        self,
        model,
        params,
        n_slots: int,
        max_len: int,
        n_layer: Optional[int] = None,
        n_head: Optional[int] = None,
        head_dim: Optional[int] = None,
        prefill_buckets: Optional[Sequence[int]] = None,
        cache_dtype: Any = jnp.bfloat16,
        top_k: Optional[int] = None,
        decode_steps: int = 8,
        prefill_batch: int = 8,
        seed: int = 0,
        adapters: Optional[dict] = None,
        prefill_chunk: Optional[int] = None,
        window: Optional[int] = None,
        sinks: int = 4,
        conditioning_spec: Optional[Any] = None,
        kv_prefix_len: Optional[int] = None,
        draft_model: Optional[Any] = None,
        draft_params: Optional[Any] = None,
        gamma: int = 4,
    ):
        self.model = model
        self.params = params
        self.n_slots = n_slots
        self.max_len = max_len
        self.top_k = top_k
        self.decode_steps = decode_steps
        # sliding-window streaming (StreamingLLM-style): the per-slot cache
        # becomes ``sinks`` pinned rows + a ``window``-slot ring buffer;
        # decode positions grow without bound (unlimited generation length,
        # constant memory), attending the sinks plus the last ``window``
        # tokens. Requires a relative positional scheme in the model
        # (rope; ops/rotary.py) — absolute embeddings would be read out of
        # range. Prompts must fit the buffer (no wrap during prefill).
        if window is not None:
            if window < 1:
                raise ValueError(f"window must be >= 1, got {window}")
            if getattr(model, "positional", None) == "learned":
                raise ValueError(
                    "sliding-window streaming needs a relative positional "
                    "scheme (positions grow past max_seq_len) — build the "
                    "model with positional='rope'"
                )
        self.window = window
        self.sinks = sinks if window is not None else 0
        self.cache_len = (
            self.sinks + window if window is not None else max_len
        )
        n_layer = n_layer if n_layer is not None else model.n_layer
        # cache geometry: GQA models cache only their kv heads
        if n_head is None:
            n_head = getattr(model, "n_kv_head", None) or model.n_head
        head_dim = (
            head_dim if head_dim is not None
            else model.d_model // getattr(model, "n_head", n_head)
        )
        if prefill_buckets is None:
            top = self.cache_len
            prefill_buckets = [
                1 << p for p in range(int(np.ceil(np.log2(top))) + 1)
                if (1 << p) <= top
            ]
        self.prefill_buckets = sorted(prefill_buckets)
        self.prefill_batch = prefill_batch
        self.prefill_chunk = prefill_chunk
        # row n_slots is the trash row: batched-prefill padding writes there
        kv_shape = (n_slots + 1, n_head, self.cache_len, head_dim)
        if cache_dtype != "int8" and np.issubdtype(
            np.dtype(cache_dtype), np.integer
        ):
            # jnp.int8 etc. must not fall into the dense branch: astype
            # would silently truncate activations to integers
            raise ValueError(
                f"integer cache_dtype {cache_dtype!r} — pass the string "
                "'int8' for the quantized KV cache"
            )
        if cache_dtype == "int8":
            # int8 KV halves (vs bf16) the per-tick cache read — the decode
            # bottleneck at batch (ops/kv_cache.py)
            self.cache = tuple(
                (quantized_kv_zeros(kv_shape), quantized_kv_zeros(kv_shape))
                for _ in range(n_layer)
            )
        else:
            self.cache = tuple(
                (jnp.zeros(kv_shape, cache_dtype),
                 jnp.zeros(kv_shape, cache_dtype))
                for _ in range(n_layer)
            )
        # per-slot conditioning buffer (row n_slots = trash, like the cache);
        # idle rows hold zeros — cross-attention over zero states is finite
        # (uniform softmax) and those rows' outputs are discarded anyway
        self.conditioning = (
            jax.tree_util.tree_map(
                lambda s: jnp.zeros(
                    (n_slots + 1,) + tuple(s.shape), s.dtype
                ),
                conditioning_spec,
            )
            if conditioning_spec is not None
            else None
        )
        if kv_prefix_len is not None and kv_prefix_len >= self.cache_len:
            raise ValueError(
                f"kv_prefix_len ({kv_prefix_len}) must leave room for the "
                f"prompt and generation (cache_len {self.cache_len})"
            )
        self.kv_prefix_len = kv_prefix_len
        # (n_layer, heads, head_dim) for Request.kv_prefix validation
        self._kv_geom = (n_layer, n_head, head_dim)
        self._slots = [_Slot() for _ in range(n_slots)]
        self._queue: deque = deque()
        self._done: List[RequestOutput] = []
        self._prefixes: dict = {}  # name -> (kv rows tuple, length, adapter)
        self._adapter_table, self._lora = build_adapter_table(adapters)
        self._rng = jax.random.PRNGKey(seed)
        self.ticks = 0  # decode steps executed (for occupancy accounting)
        self._served_slot_ticks = 0  # live slots x ticks, for occupancy
        self._finished = 0
        self._tokens_out = 0
        # ---- speculative decoding (in-engine, lossless) -----------------
        # A draft LM proposes ``gamma`` tokens per slot per round; the
        # target verifies the whole window in ONE forward; acceptance is
        # the exact rejection rule (serving/speculative.py:
        # ``speculative_acceptance``) so sampled requests keep their exact
        # target distribution and greedy requests are token-identical to
        # plain decoding. Speculative and plain (greedy/sampled) requests
        # share the continuous batch — acceptance is per-slot.
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.gamma = gamma
        self._spec_rounds = 0
        self._spec_accepted = 0  # accepted DRAFT tokens (excl. bonus)
        if draft_model is not None:
            unsupported = [
                name for name, flag in (
                    ("window", window is not None),
                    ("conditioning_spec", conditioning_spec is not None),
                    ("kv_prefix_len", kv_prefix_len is not None),
                    ("prefill_chunk", prefill_chunk is not None),
                    ("cache_dtype='int8'", cache_dtype == "int8"),
                    ("adapters", adapters is not None),
                ) if flag
            ]
            if unsupported:
                raise ValueError(
                    "speculative decoding does not compose with "
                    + ", ".join(unsupported)
                )
            d_layer = draft_model.n_layer
            d_head = getattr(draft_model, "n_kv_head", None) or draft_model.n_head
            d_dim = draft_model.d_model // draft_model.n_head
            d_shape = (n_slots + 1, d_head, self.cache_len, d_dim)
            self.draft_cache = tuple(
                (jnp.zeros(d_shape, cache_dtype),
                 jnp.zeros(d_shape, cache_dtype))
                for _ in range(d_layer)
            )

    def _adapter_id(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        if self._adapter_table is None or name not in self._adapter_table:
            raise ValueError(f"unknown adapter {name!r}")
        return self._adapter_table[name]

    def register_prefix(
        self, name: str, tokens: Sequence[int],
        adapter: Optional[str] = None,
    ) -> None:
        """Precompute the KV rows of a shared prompt prefix (system prompt)
        once; requests naming it skip recomputing those positions. A prefix
        computed with ``adapter`` is only valid for requests using that
        same adapter (KV rows are adapter-dependent); ``submit`` enforces
        the pairing."""
        tokens = np.asarray(tokens, np.int32)
        if len(tokens) == 0:
            raise ValueError("empty prefix")
        if self.conditioning is not None:
            raise ValueError(
                "prefix caching does not compose with per-request "
                "conditioning: prefix KV rows depend on the conditioning "
                "through cross-attention, so a shared prefix would be wrong "
                "for every request but one"
            )
        if self.kv_prefix_len is not None:
            raise ValueError(
                "registered prefixes do not compose with kv_prefix_len: "
                "both claim cache positions [0, plen)"
            )
        aid = self._adapter_id(adapter)
        with multi_lora_scope(
            self._lora, jnp.full((1,), aid, jnp.int32)
        ):
            _logits, kvs = self.model.apply(
                self.params, jnp.asarray(tokens[None]), use_cache=True
            )
        # kept in compute precision; _kv_rows_like converts (or quantizes)
        # into the cache format at insert time
        self._prefixes[name] = (kvs, len(tokens), adapter)

    # ---------------------------------------------------------------- jitted
    def _cond_kwargs(self, conditioning, slots=None) -> dict:
        """``conditioning=`` kwarg for a model call: the buffer rows for
        ``slots`` (or the whole buffer when the batch is slot-aligned).
        Empty when the engine has no conditioning — unconditioned models
        never see the kwarg."""
        if self.conditioning is None:
            return {}
        if slots is None:
            return {"conditioning": conditioning}
        return {
            "conditioning": jax.tree_util.tree_map(
                lambda b: b[slots], conditioning
            )
        }

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _prefill(self, params, cache, tokens, slots, lengths, sampling,
                 rng, lora, adapter_ids, conditioning):
        """Causal forward of a BATCH of padded prompts (one length bucket),
        each row's KV block-written into its slot; returns the updated cache
        and the first sampled token per row (from the logits at
        ``lengths - 1``). Batching admissions keeps prefill on the MXU's
        preferred shapes and pays one dispatch for up to ``prefill_batch``
        requests; padding rows carry slot id ``n_slots`` (the trash row)."""
        with multi_lora_scope(lora, adapter_ids):
            logits, kvs = self.model.apply(
                params, tokens, use_cache=True,
                **self._cond_kwargs(conditioning, slots),
            )
        bucket = tokens.shape[1]
        new = []
        for (ck, cv), (k, v) in zip(cache, kvs):
            new.append((
                _kv_set_rows(ck, k, slots, bucket),
                _kv_set_rows(cv, v, slots, bucket),
            ))
        last = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1
        )[:, 0]
        toks = self._sample(last, sampling, rng)
        return tuple(new), toks

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _prefill_prefixed(
        self, params, cache, prefix_kvs, plen, tokens, slots, lengths,
        sampling, rng, lora, adapter_ids, conditioning,
    ):
        """Prefill a batch of SUFFIX prompts on top of a precomputed prefix:
        the prefix KV rows — ``(1, ...)`` for a shared registered prefix,
        broadcast, or ``(b, ...)`` for per-request ``kv_prefix`` rows — are
        placed into each row, the suffix forward attends them through the
        valid-prefix mask and writes its own rows from ``plen``, and the
        whole rows are scattered into the slots. ``conditioning`` is always
        None on the registered-prefix path (``register_prefix`` rejects
        conditioning engines); per-request kv_prefix composes with it.

        Writes are per-position (not a block write at ``plen``): when
        ``plen + bucket > max_len`` a contiguous ``dynamic_update_slice``
        would clamp its start backwards and overwrite prefix rows; instead
        each padding position past the row's real prompt redirects to the
        sacrificial ``max_len - 1`` index (overwritten before it is ever
        attended)."""
        b, bucket = tokens.shape
        max_len = self.cache_len
        rows = tuple(
            (
                _kv_rows_like(ck, b, pk, pk.shape[2]),
                _kv_rows_like(cv, b, pv, pv.shape[2]),
            )
            for (ck, cv), (pk, pv) in zip(cache, prefix_kvs)
        )
        offs = jnp.arange(bucket)[None, :]
        positions = jnp.minimum(plen + offs, max_len - 1)
        write_idx = jnp.broadcast_to(
            jnp.where(offs < lengths[:, None], positions, max_len - 1),
            (b, bucket),
        )
        mask = (
            jnp.arange(max_len)[None, None, None, :]
            <= positions[:, None, :, None]
        )
        with multi_lora_scope(lora, adapter_ids):
            logits, new_rows = self.model.apply(
                params, tokens,
                positions=jnp.broadcast_to(positions, (b, bucket)),
                past_key_values=rows, cache_index=write_idx,
                attention_mask=mask, use_cache=True,
                **self._cond_kwargs(conditioning, slots),
            )
        new = tuple(
            (_kv_scatter_rows(ck, rk, slots), _kv_scatter_rows(cv, rv, slots))
            for (ck, cv), (rk, rv) in zip(cache, new_rows)
        )
        last = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1
        )[:, 0]
        toks = self._sample(last, sampling, rng)
        return new, toks

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _prefill_chunk(
        self, params, cache, tokens, slots, starts, valids, sampling,
        rng, lora, adapter_ids, conditioning,
    ):
        """One fixed-width chunk of prompt for up to ``prefill_batch`` rows
        (chunked prefill): each row's earlier chunks already live in its
        slot, so the chunk forward attends them through the valid-prefix
        mask and appends its own ``chunk`` positions. ONE compiled program
        covers every prompt length — long prompts stop needing a
        per-bucket compile, and prefill activation memory is bounded by
        the chunk width instead of the prompt length.

        A partial last chunk redirects its padding positions' KV writes to
        the sacrificial ``max_len - 1`` index (never attended before it is
        overwritten: the mask admits position p only from sequence position
        p on, and the tick that reaches p overwrites p before attending).
        Sampling: returns a token per row from the logits at
        ``valids - 1``; the host uses it only for rows whose prompt ends
        in this chunk."""
        b, chunk = tokens.shape
        max_len = self.cache_len
        rows = tuple(
            (_kv_gather_rows(ck, slots), _kv_gather_rows(cv, slots))
            for ck, cv in cache
        )
        offs = jnp.arange(chunk)[None, :]
        positions = jnp.minimum(starts[:, None] + offs, max_len - 1)
        # pad positions of a partial chunk write to max_len - 1 (see above)
        write_idx = jnp.where(
            offs < valids[:, None], positions, max_len - 1
        )
        mask = (
            jnp.arange(max_len)[None, None, None, :]
            <= positions[:, None, :, None]
        )
        with multi_lora_scope(lora, adapter_ids):
            logits, new_rows = self.model.apply(
                params, tokens, positions=positions,
                past_key_values=rows, cache_index=write_idx,
                attention_mask=mask, use_cache=True,
                **self._cond_kwargs(conditioning, slots),
            )
        # scatter back only this chunk's written span — a whole-row
        # scatter would pay O(max_len) copy traffic per chunk
        new = tuple(
            (
                _kv_put_positions(
                    ck, _kv_take_positions(rk, write_idx), slots, write_idx
                ),
                _kv_put_positions(
                    cv, _kv_take_positions(rv, write_idx), slots, write_idx
                ),
            )
            for (ck, cv), (rk, rv) in zip(cache, new_rows)
        )
        last = jnp.take_along_axis(
            logits, (valids - 1)[:, None, None], axis=1
        )[:, 0]
        toks = self._sample(last, sampling, rng)
        return new, toks

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _seed_prefix(self, cache, prefix_kvs, slots):
        """Broadcast a registered prefix's KV rows into ``slots`` (chunked
        prefill of prefixed requests seeds the slot, then chunks the
        suffix)."""
        b = slots.shape[0]
        new = []
        for (ck, cv), (pk, pv) in zip(cache, prefix_kvs):
            rk = _kv_rows_like(ck, b, pk, pk.shape[2])
            rv = _kv_rows_like(cv, b, pv, pv.shape[2])
            new.append((
                _kv_scatter_rows(ck, rk, slots),
                _kv_scatter_rows(cv, rv, slots),
            ))
        return tuple(new)

    @partial(jax.jit, static_argnums=(0, 11), donate_argnums=(2,))
    def _decode(self, params, cache, tokens, positions, advance, sampling,
                rng, lora, adapter_ids, conditioning, filters_on=True):
        """``decode_steps`` lockstep decode ticks for every slot, fused into
        one device program (``lax.scan``): the host round-trip — which
        dominates tick time when the host link is thin — amortizes over
        ``decode_steps`` sampled tokens per slot. Slots that finish mid-call
        keep decoding garbage into their own (about-to-be-recycled) rows;
        the host discards those tokens. Position writes clamp to the last
        row so an already-finished slot can never scribble past its
        buffer."""

        def tick(carry, step_rng):
            tokens, positions, cache = carry
            if self.window is not None:
                # streaming: positions grow without bound; the write lands
                # in the sinks region or the ring slot of the last
                # ``window`` tokens, and once the buffer has filled every
                # row is one of sinks + last-window — exactly the
                # StreamingLLM attention set
                pos = positions
                write_idx = jnp.where(
                    pos < self.sinks,
                    pos,
                    self.sinks + (pos - self.sinks) % self.window,
                )
            else:
                pos = jnp.minimum(positions, self.cache_len - 1)
                write_idx = pos
            mask = (
                jnp.arange(self.cache_len)[None, None, None, :]
                <= pos[:, None, None, None]
            )
            with multi_lora_scope(lora, adapter_ids):
                logits, cache = self.model.apply(
                    params,
                    tokens[:, None],
                    positions=pos[:, None],
                    past_key_values=cache,
                    cache_index=write_idx,
                    attention_mask=mask,
                    use_cache=True,
                    # whole buffer: the decode batch is slot-aligned
                    **self._cond_kwargs(conditioning),
                )
            next_tokens = self._sample(
                logits[:, 0], sampling, step_rng, use_filters=filters_on
            )
            # idle rows don't advance: their write target stays pinned at
            # the sacrificial index instead of cycling through the ring
            return (next_tokens, positions + advance, cache), next_tokens

        rngs = jax.random.split(rng, self.decode_steps)
        (_, _, cache), toks = jax.lax.scan(
            tick, (tokens, positions, cache), rngs
        )
        return toks, cache  # toks: (decode_steps, n_slots)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _prefill_draft(self, d_params, d_cache, tokens, slots):
        """Causal draft forward of the admission batch's padded prompts,
        KV block-written into the draft cache's slot rows (mirror of
        ``_prefill`` minus sampling/adapters)."""
        _logits, kvs = self.draft_model.apply(
            d_params, tokens, use_cache=True
        )
        bucket = tokens.shape[1]
        return tuple(
            (_kv_set_rows(ck, k, slots, bucket),
             _kv_set_rows(cv, v, slots, bucket))
            for (ck, cv), (k, v) in zip(d_cache, kvs)
        )

    def _probs(self, logits, sampling, use_filters: bool = True):
        """Per-row NEXT-TOKEN DISTRIBUTIONS under the same warping as
        ``_sample`` (temperature, then top-k/top-p); greedy rows
        (temperature == 0) become one-hot argmax. The speculative paths
        need the distribution itself — proposals must be sampled from it
        and the acceptance rule compares it against the target's."""
        logits = logits.astype(jnp.float32)
        temperature = sampling[:, 0]
        onehot = jax.nn.one_hot(
            jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32
        )
        scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
        if use_filters:
            scaled = filter_logits_per_row(
                scaled, sampling[:, 1].astype(jnp.int32), sampling[:, 2]
            )
        probs = jax.nn.softmax(scaled, axis=-1)
        return jnp.where(temperature[:, None] > 0, probs, onehot)

    @partial(jax.jit, static_argnums=(0, 11), donate_argnums=(3, 4))
    def _spec_decode(self, params, d_params, cache, d_cache, tokens,
                     positions, advance, sampling, rng, lora,
                     filters_on=True):
        """``decode_steps`` speculative ROUNDS fused into one device call.
        Each round: the draft proposes ``gamma`` tokens per slot (gamma+1
        cheap forwards — the extra tick writes the last proposal's KV row
        so full acceptance leaves no cache hole), the target scores the
        whole window in ONE forward, and the per-slot rejection rule emits
        1..gamma+1 tokens whose distribution is exactly the target's.
        Returns (emitted (rounds, b, gamma+1), counts (rounds, b), caches).
        """
        from multimodal_tpu.serving.speculative import speculative_acceptance

        g = self.gamma
        b = tokens.shape[0]

        def round_fn(carry, round_rng):
            tokens, positions, cache, d_cache = carry
            # clamp so a finishing slot's overshoot stays inside its own row
            pos0 = jnp.minimum(positions, self.cache_len - 1 - g)
            rng_d, rng_a = jax.random.split(round_rng)

            def d_tick(c, tick_rng):
                tok, pos, dc = c
                mask = (
                    jnp.arange(self.cache_len)[None, None, None, :]
                    <= pos[:, None, None, None]
                )
                logits, dc = self.draft_model.apply(
                    d_params, tok[:, None], positions=pos[:, None],
                    past_key_values=dc, cache_index=pos,
                    attention_mask=mask, use_cache=True,
                )
                probs = self._probs(
                    logits[:, 0], sampling, use_filters=filters_on
                )
                nxt = jax.random.categorical(
                    tick_rng, jnp.log(jnp.maximum(probs, 1e-38)), axis=-1
                ).astype(jnp.int32)
                return (nxt, pos + 1, dc), (nxt, probs)

            # gamma + 1 draft ticks: the last one only lands proposal g's
            # KV row (its own proposal is discarded)
            (_, _, d_cache), (proposed, d_probs) = jax.lax.scan(
                d_tick, (tokens, pos0, d_cache),
                jax.random.split(rng_d, g + 1),
            )
            proposed = proposed[:g].T  # (b, g)
            d_probs = jnp.swapaxes(d_probs[:g], 0, 1)  # (b, g, V)

            window = jnp.concatenate([tokens[:, None], proposed], axis=1)
            pos_win = pos0[:, None] + jnp.arange(g + 1)[None, :]
            mask = (
                jnp.arange(self.cache_len)[None, None, None, :]
                <= pos_win[:, None, :, None]
            )
            logits_t, cache = self.model.apply(
                params, window, positions=pos_win,
                past_key_values=cache, cache_index=pos0,
                attention_mask=mask, use_cache=True,
            )
            t_probs = self._probs(
                logits_t.reshape(b * (g + 1), -1),
                jnp.repeat(sampling, g + 1, axis=0),
                use_filters=filters_on,
            ).reshape(b, g + 1, -1)

            emit, k = speculative_acceptance(
                proposed, d_probs, t_probs, rng_a
            )
            k = jnp.where(advance > 0, k, 0)  # idle rows emit nothing
            cur = jnp.where(
                advance > 0,
                jnp.take_along_axis(
                    emit, jnp.maximum(k - 1, 0)[:, None], axis=1
                )[:, 0],
                tokens,
            )
            positions = positions + k
            return (cur, positions, cache, d_cache), (emit, k)

        rngs = jax.random.split(rng, self.decode_steps)
        (_, _, cache, d_cache), (emits, counts) = jax.lax.scan(
            round_fn, (tokens, positions, cache, d_cache), rngs
        )
        return emits, counts, cache, d_cache

    def _sample(self, logits, sampling, rng, use_filters: bool = True):
        """Greedy where temperature == 0, else temperature sampling with
        per-row top-k / nucleus filtering. ``sampling`` is (b, 3):
        [temperature, top_k (0 = off), top_p (>= 1 = off)].
        ``use_filters=False`` (a trace-time static) skips the full-vocab
        sorts entirely — the hot decode scan only pays them when some live
        slot actually set a filter."""
        logits = logits.astype(jnp.float32)
        temperature = sampling[:, 0]
        greedy = jnp.argmax(logits, axis=-1)
        # temperature BEFORE the filters (top-p truncates the tempered
        # distribution — standard HF/vLLM warper order; top-k is
        # scale-invariant either way)
        scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
        if use_filters:
            scaled = filter_logits_per_row(
                scaled, sampling[:, 1].astype(jnp.int32), sampling[:, 2]
            )
        sampled = jax.random.categorical(rng, scaled, axis=-1)
        return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)

    def _sampling_row(self, req: Request):
        """[temperature, top_k, top_p] for one request, engine defaults
        filled in."""
        k = req.top_k if req.top_k is not None else (self.top_k or 0)
        p = req.top_p if req.top_p is not None else 1.0
        return (req.temperature, float(k), float(p))

    # ----------------------------------------------------------------- host
    def submit(self, request: Request) -> None:
        self._adapter_id(request.adapter)  # raises on unknown name
        if self.draft_model is not None:
            if request.prefix is not None:
                raise ValueError(
                    "speculative decoding does not compose with registered "
                    "prefixes yet (the draft cache has no prefix rows)"
                )
            # the last round may scribble up to gamma rows past max_new
            if (
                len(request.prompt) + request.max_new_tokens
                + self.gamma + 1 > self.max_len
            ):
                raise ValueError(
                    f"prompt({len(request.prompt)}) + max_new_tokens"
                    f"({request.max_new_tokens}) + gamma+1({self.gamma + 1}) "
                    f"exceeds max_len({self.max_len}) — speculative rounds "
                    "need slack for the proposal window"
                )
        if (self.kv_prefix_len is not None) != (
            request.kv_prefix is not None
        ):
            raise ValueError(
                "Request.kv_prefix is required exactly when the engine was "
                f"built with kv_prefix_len (engine: {self.kv_prefix_len}, "
                f"request: {request.kv_prefix is not None})"
            )
        plen = 0
        if request.kv_prefix is not None:
            if request.prefix is not None:
                raise ValueError(
                    "kv_prefix and a registered prefix cannot combine: both "
                    "claim cache positions [0, plen)"
                )
            n_layer, n_head, head_dim = self._kv_geom
            if len(request.kv_prefix) != n_layer:
                raise ValueError(
                    f"kv_prefix has {len(request.kv_prefix)} layers, "
                    f"cache has {n_layer}"
                )
            want = (n_head, self.kv_prefix_len, head_dim)
            for li, (k, v) in enumerate(request.kv_prefix):
                for nm, arr in (("k", k), ("v", v)):
                    if tuple(np.shape(arr)) != want:
                        raise ValueError(
                            f"kv_prefix layer {li} {nm} shape "
                            f"{tuple(np.shape(arr))} != {want}"
                        )
            plen = self.kv_prefix_len
        if request.prefix is not None:
            if request.prefix not in self._prefixes:
                raise ValueError(f"unknown prefix {request.prefix!r}")
            plen = self._prefixes[request.prefix][1]
            pfx_adapter = self._prefixes[request.prefix][2]
            if pfx_adapter != request.adapter:
                raise ValueError(
                    f"prefix {request.prefix!r} was computed with adapter "
                    f"{pfx_adapter!r}; request uses {request.adapter!r} "
                    "(prefix KV rows are adapter-dependent)"
                )
        if self.window is not None:
            # streaming: generation length is unbounded; the prompt must
            # fit the buffer without wrapping (and stay clear of the
            # sacrificial last ring slot)
            if plen + len(request.prompt) > self.cache_len - 1:
                raise ValueError(
                    f"prefix({plen}) + prompt({len(request.prompt)}) "
                    f"exceeds the streaming buffer "
                    f"(sinks {self.sinks} + window {self.window} - 1)"
                )
        elif (
            plen + len(request.prompt) + request.max_new_tokens > self.max_len
        ):
            raise ValueError(
                f"prefix({plen}) + prompt({len(request.prompt)}) + "
                f"max_new_tokens({request.max_new_tokens}) exceeds "
                f"max_len({self.max_len})"
            )
        if len(request.prompt) == 0:
            raise ValueError("empty prompt")
        if (self.conditioning is not None) != (
            request.conditioning is not None
        ):
            raise ValueError(
                "Request.conditioning is required exactly when the engine "
                "was built with conditioning_spec "
                f"(engine: {self.conditioning is not None}, "
                f"request: {request.conditioning is not None})"
            )
        if self.conditioning is not None:
            jax.tree_util.tree_map(
                lambda buf, r: (_ for _ in ()).throw(ValueError(
                    f"conditioning leaf shape {np.shape(r)} != spec "
                    f"{buf.shape[1:]}"
                )) if tuple(np.shape(r)) != tuple(buf.shape[1:]) else None,
                self.conditioning, request.conditioning,
            )
        request._submit_t = time.perf_counter()
        self._queue.append(request)

    def _stack_kv_prefixes(self, chunk, n: int):
        """Per-layer (n, heads, P, head_dim) stacks of ``chunk``'s requests'
        kv_prefix rows, zero rows for the padding entries (their whole
        cache rows land in the trash slot anyway)."""
        n_layer, n_head, head_dim = self._kv_geom
        pad = np.zeros(
            (n_head, self.kv_prefix_len, head_dim), np.float32
        )
        out = []
        for li in range(n_layer):
            ks = [
                np.asarray(req.kv_prefix[li][0], np.float32)
                for _, req in chunk
            ]
            vs = [
                np.asarray(req.kv_prefix[li][1], np.float32)
                for _, req in chunk
            ]
            ks += [pad] * (n - len(chunk))
            vs += [pad] * (n - len(chunk))
            out.append((jnp.asarray(np.stack(ks)), jnp.asarray(np.stack(vs))))
        return tuple(out)

    def _write_conditioning(self, pairs) -> None:
        """Scatter admitted requests' conditioning pytrees into their slot
        rows (one batched scatter per leaf)."""
        if self.conditioning is None or not pairs:
            return
        slots = jnp.asarray([sid for sid, _ in pairs], jnp.int32)
        batched = jax.tree_util.tree_map(
            lambda *leaves: jnp.asarray(np.stack(
                [np.asarray(l) for l in leaves]
            )),
            *[req.conditioning for _, req in pairs],
        )
        self.conditioning = jax.tree_util.tree_map(
            lambda buf, new: buf.at[slots].set(new.astype(buf.dtype)),
            self.conditioning, batched,
        )

    def _admit(self) -> None:
        # pair free slots with queued requests, group by length bucket;
        # cancelled-in-queue requests retire without touching a slot
        pairs = []
        for slot_id, slot in enumerate(self._slots):
            while self._queue and getattr(
                self._queue[0], "_cancelled", False
            ):
                req = self._queue.popleft()
                out = RequestOutput(req.request_id, len(req.prompt))
                out.finish_reason = "cancelled"
                self._finished += 1
                self._done.append(out)
                if req.on_finish is not None:
                    req.on_finish(out)
            if not self._queue:
                break
            if slot.free:
                pairs.append((slot_id, self._queue.popleft()))
        if not pairs:
            return
        self._write_conditioning(pairs)
        if self.prefill_chunk is not None:
            chunked = [
                p for p in pairs if len(p[1].prompt) > self.prefill_chunk
            ]
            pairs = [
                p for p in pairs if len(p[1].prompt) <= self.prefill_chunk
            ]
            if chunked:
                self._admit_chunked(chunked)
        groups: dict = {}
        for slot_id, req in pairs:
            bucket = _bucket(len(req.prompt), self.prefill_buckets)
            groups.setdefault(
                (bucket, req.prefix, req.kv_prefix is not None), []
            ).append((slot_id, req))

        admitted = []
        for (bucket, prefix, kvp), items in groups.items():
            pfx_kvs, plen = (
                self._prefixes[prefix][:2] if prefix is not None
                else (None, 0)
            )
            if kvp:
                plen = self.kv_prefix_len
            for c in range(0, len(items), self.prefill_batch):
                chunk = items[c : c + self.prefill_batch]
                n = self.prefill_batch
                tokens = np.zeros((n, bucket), np.int32)
                slots = np.full(n, self.n_slots, np.int32)  # default: trash
                lengths = np.ones(n, np.int32)
                sampling = np.zeros((n, 3), np.float32)
                sampling[:, 2] = 1.0
                adapter_ids = np.zeros(n, np.int32)
                for j, (slot_id, req) in enumerate(chunk):
                    prompt = np.asarray(req.prompt, np.int32)
                    tokens[j, : len(prompt)] = prompt
                    slots[j] = slot_id
                    lengths[j] = len(prompt)
                    sampling[j] = self._sampling_row(req)
                    adapter_ids[j] = self._adapter_id(req.adapter)
                    slot = self._slots[slot_id]
                    slot.request = req
                    slot.output = RequestOutput(
                        req.request_id, plen + len(prompt)
                    )
                    slot.admit_t = time.perf_counter()
                    slot.output.queue_time = slot.admit_t - getattr(
                        req, "_submit_t", slot.admit_t
                    )
                    slot.pos = plen + len(prompt)
                    slot.adapter_id = adapter_ids[j]
                self._rng, rng = jax.random.split(self._rng)
                if kvp:
                    # per-request prefix rows, padding rows zero
                    pfx_kvs = self._stack_kv_prefixes(chunk, n)
                if prefix is None and not kvp:
                    self.cache, firsts = self._prefill(
                        self.params, self.cache, jnp.asarray(tokens),
                        jnp.asarray(slots), jnp.asarray(lengths),
                        jnp.asarray(sampling), rng, self._lora,
                        jnp.asarray(adapter_ids), self.conditioning,
                    )
                    if self.draft_model is not None:
                        # the draft needs the same context rows before its
                        # first proposal round
                        self.draft_cache = self._prefill_draft(
                            self.draft_params, self.draft_cache,
                            jnp.asarray(tokens), jnp.asarray(slots),
                        )
                else:
                    self.cache, firsts = self._prefill_prefixed(
                        self.params, self.cache, pfx_kvs,
                        jnp.asarray(plen, jnp.int32), jnp.asarray(tokens),
                        jnp.asarray(slots), jnp.asarray(lengths),
                        jnp.asarray(sampling), rng, self._lora,
                        jnp.asarray(adapter_ids), self.conditioning,
                    )
                admitted.append((chunk, firsts))
        # pull first tokens only after every prefill is dispatched
        for chunk, firsts in admitted:
            firsts = np.asarray(firsts)
            for j, (slot_id, _req) in enumerate(chunk):
                self._slots[slot_id].last_token = int(firsts[j])
                self._collect(slot_id, self._slots[slot_id].last_token)

    def _admit_chunked(self, items) -> None:
        """Queue ``items`` (slot_id, request) for chunked prefill: the slot
        is seeded (prefix rows) and its prompt split into fixed-width
        chunks; ``_advance_chunks`` (called every ``step``) then advances every
        prefilling slot ONE chunk per tick, so a long prompt never stalls
        the decode of live slots for more than one chunk's latency."""
        chunk = self.prefill_chunk
        for slot_id, req in items:
            plen = 0
            if req.prefix is not None:
                pfx_kvs, plen, _ = self._prefixes[req.prefix]
                self.cache = self._seed_prefix(
                    self.cache, pfx_kvs,
                    jnp.asarray([slot_id], jnp.int32),
                )
            elif req.kv_prefix is not None:
                plen = self.kv_prefix_len
                self.cache = self._seed_prefix(
                    self.cache,
                    self._stack_kv_prefixes([(slot_id, req)], 1),
                    jnp.asarray([slot_id], jnp.int32),
                )
            prompt = np.asarray(req.prompt, np.int32)
            slot = self._slots[slot_id]
            slot.request = req
            slot.output = RequestOutput(req.request_id, plen + len(prompt))
            slot.admit_t = time.perf_counter()
            slot.output.queue_time = slot.admit_t - getattr(
                req, "_submit_t", slot.admit_t
            )
            slot.pos = plen + len(prompt)
            slot.adapter_id = self._adapter_id(req.adapter)
            slot.chunks = deque(
                (prompt[c : c + chunk], plen + c)
                for c in range(0, len(prompt), chunk)
            )

    def _advance_chunks(self) -> None:
        """Run one prompt chunk for every prefilling slot (batched in
        groups of ``prefill_batch``); slots finishing their last chunk
        sample their first token and go live for decode."""
        chunk = self.prefill_chunk
        prefilling = [
            i for i, s in enumerate(self._slots) if s.prefilling
        ]
        for g in range(0, len(prefilling), self.prefill_batch):
            group = prefilling[g : g + self.prefill_batch]
            n = self.prefill_batch
            tokens = np.zeros((n, chunk), np.int32)
            slots = np.full(n, self.n_slots, np.int32)  # default: trash
            starts = np.zeros(n, np.int32)
            valids = np.ones(n, np.int32)
            sampling = np.zeros((n, 3), np.float32)
            sampling[:, 2] = 1.0
            adapter_ids = np.zeros(n, np.int32)
            enders = []
            for j, slot_id in enumerate(group):
                slot = self._slots[slot_id]
                piece, start = slot.chunks.popleft()
                tokens[j, : len(piece)] = piece
                slots[j] = slot_id
                starts[j] = start
                valids[j] = len(piece)
                sampling[j] = self._sampling_row(slot.request)
                adapter_ids[j] = slot.adapter_id
                if not slot.prefilling:  # that was the last chunk
                    enders.append((j, slot_id))
            self._rng, rng = jax.random.split(self._rng)
            self.cache, toks = self._prefill_chunk(
                self.params, self.cache, jnp.asarray(tokens),
                jnp.asarray(slots), jnp.asarray(starts),
                jnp.asarray(valids), jnp.asarray(sampling), rng, self._lora,
                jnp.asarray(adapter_ids), self.conditioning,
            )
            for j, slot_id in enders:
                self._slots[slot_id].last_token = int(np.asarray(toks)[j])
                self._collect(slot_id, self._slots[slot_id].last_token)

    def cancel(self, request: Request) -> None:
        """Mark a submitted request cancelled: it retires at its next
        collected token (or is dropped from the queue before admission)
        with ``finish_reason='cancelled'`` — a disconnected client stops
        billing slot time."""
        request._cancelled = True

    def _collect(self, slot_id: int, token: int) -> None:
        """Record a sampled token; retire the slot on eos / length /
        cancellation."""
        slot = self._slots[slot_id]
        req, out = slot.request, slot.output
        now = time.perf_counter()
        if getattr(req, "_cancelled", False):
            out.finish_reason = "cancelled"
            if slot.first_t == 0.0:
                slot.first_t = now
            out.decode_time = now - slot.first_t
            self._finished += 1
            self._tokens_out += len(out.tokens)
            self._done.append(out)
            self._slots[slot_id] = _Slot()
            if req.on_finish is not None:
                req.on_finish(out)
            return
        out.tokens.append(token)
        if len(out.tokens) == 1:
            slot.first_t = now
            out.prefill_time = now - slot.admit_t
        if req.on_token is not None:
            req.on_token(token)
        if req.eos_id is not None and token == req.eos_id:
            out.finish_reason = "eos"
        elif len(out.tokens) >= req.max_new_tokens:
            out.finish_reason = "length"
        else:
            return
        out.decode_time = now - slot.first_t
        self._finished += 1
        self._tokens_out += len(out.tokens)
        self._done.append(out)
        self._slots[slot_id] = _Slot()
        if req.on_finish is not None:
            req.on_finish(out)

    def step(self) -> int:
        """Admit what fits, advance pending prompt chunks by one, then run
        one fused ``decode_steps``-tick decode call. Returns the number of
        live slots served."""
        self._admit()
        if self.prefill_chunk is not None:
            self._advance_chunks()
        live = [
            i for i, s in enumerate(self._slots)
            if not s.free and not s.prefilling
        ]
        if not live:
            return 0
        # n_slots + 1 rows: the trash row decodes too (idle garbage, <2%
        # overhead) so the batch width matches the cache. Idle rows write
        # their garbage at the sacrificial max_len-1 index — position 0
        # would corrupt the first chunk of a mid-prefill slot
        tokens = np.zeros(self.n_slots + 1, np.int32)
        positions = np.full(self.n_slots + 1, self.cache_len - 1, np.int32)
        advance = np.zeros(self.n_slots + 1, np.int32)
        sampling = np.zeros((self.n_slots + 1, 3), np.float32)
        sampling[:, 2] = 1.0
        adapter_ids = np.zeros(self.n_slots + 1, np.int32)
        for i in live:
            s = self._slots[i]
            tokens[i] = s.last_token
            positions[i] = s.pos
            advance[i] = 1
            sampling[i] = self._sampling_row(s.request)
            adapter_ids[i] = s.adapter_id
        self._rng, rng = jax.random.split(self._rng)
        # trace-time flag: pay the per-row filter sorts only when some live
        # slot sampled with a filter enabled
        filters_on = bool(
            np.any(
                (sampling[:, 0] > 0)
                & ((sampling[:, 1] > 0) | (sampling[:, 2] < 1.0))
            )
        )
        if self.draft_model is not None:
            emits, counts, self.cache, self.draft_cache = self._spec_decode(
                self.params, self.draft_params, self.cache, self.draft_cache,
                jnp.asarray(tokens), jnp.asarray(positions),
                jnp.asarray(advance), jnp.asarray(sampling), rng, self._lora,
                filters_on,
            )
            emits = np.asarray(emits)    # (rounds, b, gamma + 1)
            counts = np.asarray(counts)  # (rounds, b)
            self.ticks += self.decode_steps
            self._served_slot_ticks += len(live) * self.decode_steps
            self._spec_rounds += self.decode_steps * len(live)
            for r in range(emits.shape[0]):
                for i in live:
                    if self._slots[i].free:
                        continue  # finished in an earlier round; discard
                    k = int(counts[r, i])
                    self._spec_accepted += max(0, k - 1)
                    for j in range(k):
                        s = self._slots[i]
                        if s.free:
                            break
                        s.pos += 1
                        s.last_token = int(emits[r, i, j])
                        self._collect(i, s.last_token)
            return len(live)
        step_tokens, self.cache = self._decode(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(positions), jnp.asarray(advance), jnp.asarray(sampling),
            rng, self._lora, jnp.asarray(adapter_ids), self.conditioning,
            filters_on,
        )
        step_tokens = np.asarray(step_tokens)  # (decode_steps, n_slots)
        self.ticks += self.decode_steps
        self._served_slot_ticks += len(live) * self.decode_steps
        for i in live:
            for t in range(self.decode_steps):
                s = self._slots[i]
                if s.free:  # finished earlier in this call; discard the rest
                    break
                s.pos += 1
                s.last_token = int(step_tokens[t, i])
                self._collect(i, s.last_token)
        return len(live)

    def run(self) -> List[RequestOutput]:
        """Drain the queue and all live slots; return outputs in completion
        order."""
        while self._queue or any(not s.free for s in self._slots):
            self.step()
        done, self._done = self._done, []
        return done

    def stats(self) -> dict:
        """Engine-lifetime serving counters: slot occupancy (served
        slot-ticks over capacity), finished requests, emitted tokens, and
        current queue/live depth."""
        return {
            "ticks": self.ticks,
            "occupancy": (
                self._served_slot_ticks / (self.ticks * self.n_slots)
                if self.ticks else 0.0
            ),
            "requests_finished": self._finished,
            "tokens_out": self._tokens_out,
            "queue_depth": len(self._queue),
            "live_slots": sum(
                1 for s in self._slots if not s.free and not s.prefilling
            ),
            "prefilling_slots": sum(1 for s in self._slots if s.prefilling),
            **(
                {
                    "spec_rounds": self._spec_rounds,
                    "spec_acceptance": (
                        self._spec_accepted / (self._spec_rounds * self.gamma)
                        if self._spec_rounds else 0.0
                    ),
                    "spec_tokens_per_round": (
                        1 + self._spec_accepted / self._spec_rounds
                        if self._spec_rounds else 0.0
                    ),
                }
                if self.draft_model is not None else {}
            ),
        }
