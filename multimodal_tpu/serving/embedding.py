"""Batched embedding service: bucketed micro-batching for encoder towers.

Production serving layer — no reference counterpart; pairs with
``serving/engine.py`` for the retrieval/embedding half of the library
(CLIP/FLAVA/CoCa towers).

XLA compiles one program per input shape, so a service that forwards
whatever batch size arrives recompiles constantly. This server quantizes
arriving batches onto a fixed ladder of batch buckets (powers of two by
default): a request batch pads up to the next bucket, runs through the one
compiled program for that bucket, and the padding rows are sliced off.
Worst-case wasted compute is 2x for a pathological stream; in exchange the
compile set is ``len(buckets)`` programs, fixed for the life of the server.
Oversized batches split into ``max_batch`` chunks (full-bucket programs —
the throughput path).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class EmbeddingServer:
    """Shape-bucketed batching around a jitted ``apply_fn(params, batch)``.

    Args:
        apply_fn: pure function from ``(params, batch)`` to embeddings
            (e.g. ``lambda p, x: model.apply(p, x, method=CLIP.encode_image)``).
        params: model variables, device-resident.
        max_batch: largest compiled batch (the throughput bucket).
        buckets: explicit bucket ladder; default powers of two up to
            ``max_batch``.
    """

    def __init__(
        self,
        apply_fn: Callable,
        params: Any,
        max_batch: int = 256,
        buckets: Optional[Sequence[int]] = None,
    ):
        self._fn = jax.jit(apply_fn)
        self.params = params
        self.max_batch = max_batch
        if buckets is None:
            buckets = []
            b = 1
            while b < max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(max_batch)
        self.buckets = sorted(set(buckets))
        if self.buckets[-1] != max_batch:
            raise ValueError("largest bucket must equal max_batch")

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_batch

    def _run_padded(self, chunk: np.ndarray) -> np.ndarray:
        n = chunk.shape[0]
        bucket = self._bucket(n)
        if n < bucket:
            pad = np.repeat(chunk[:1], bucket - n, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        out = self._fn(self.params, jnp.asarray(chunk))
        return np.asarray(out)[:n]

    def encode(self, inputs: np.ndarray) -> np.ndarray:
        """Embed a batch of any size; returns embeddings row-aligned with
        ``inputs``. Splits into ``max_batch`` chunks, pads the tail chunk up
        to its bucket."""
        inputs = np.asarray(inputs)
        outs = [
            self._run_padded(inputs[i : i + self.max_batch])
            for i in range(0, inputs.shape[0], self.max_batch)
        ]
        return np.concatenate(outs, axis=0)
