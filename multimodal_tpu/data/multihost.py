"""Multi-host (pod-scale) input: per-process dataset shards -> global arrays.

The reference never runs beyond one node of GPUs fed by a DistributedSampler
(torch `DistributedSampler` semantics: every rank sees a disjoint strided
slice of the same epoch permutation). On a TPU pod the equivalent contract
is per-*process* (per-host): each host's data loader produces only its slice
of the global batch, and the arrays handed to the jitted step must be
**global** `jax.Array`s whose addressable shards are exactly the local data
— assembled with `jax.make_array_from_process_local_data`, never by
device_put-ing the full global batch on every host.

Three pieces:

- :func:`host_shard_indices` — the DistributedSampler analog: a
  deterministic, disjoint, equal-length strided slice of an epoch
  permutation for one process.
- :func:`global_batch_put` — lift a process-local numpy batch into a
  globally-sharded `jax.Array` pytree for a given `NamedSharding`. On a
  single-process runtime (tests, the virtual CPU mesh) local == global and
  this degenerates to an async `device_put`, so the same trainer code runs
  everywhere.
- :class:`HostShardedDataModule` — wraps any `DataModule` so its epoch
  streams yield only this process's slice (same permutation on every host:
  the shuffle seed is shared, the stride differs).

Trainer integration: ``Trainer(..., multihost=True)`` (auto-enabled when
``jax.process_count() > 1``) switches the H2D path in ``fit``/``shard_batch``
from plain sharded device_put to :func:`global_batch_put`.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import jax
import numpy as np


def host_shard_indices(
    indices: np.ndarray,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """Strided per-process slice of an epoch permutation.

    Truncates to ``len(indices) // process_count`` per process so every host
    yields the same number of batches (the collective in every train step
    means a straggler host with one extra batch would deadlock the pod —
    the same reason torch's DistributedSampler pads/drops).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} out of range for {pc} processes")
    per = len(indices) // pc
    return np.asarray(indices)[pi::pc][:per]


def local_batch_size(global_batch_size: int, process_count: Optional[int] = None) -> int:
    """Per-host batch size for a given global batch size (must divide)."""
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{pc} processes"
        )
    return global_batch_size // pc


def global_batch_put(batch: Any, sharding: Any) -> Any:
    """Assemble globally-sharded device arrays from this process's local data.

    Every array leaf of ``batch`` is this host's shard of the global batch
    (leading-dim slice for dp sharding); the returned leaves are global
    `jax.Array`s with the global shape ``(local * n_processes, ...)`` along
    the sharded dims. Single-process, this is exactly
    ``device_put(x, sharding)`` (async H2D), so it composes with
    ``device_prefetch`` double buffering unchanged.
    """

    def put(x):
        x = np.asarray(x) if not hasattr(x, "devices") else x
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


class HostShardedDataModule:
    """Wrap a DataModule so its streams yield only this process's slice.

    The wrapped module's ``batch_size`` is interpreted as the PER-HOST batch
    size; the global batch seen by the jitted step is
    ``batch_size * process_count``. All hosts must construct it with the
    same ``seed`` so the epoch permutation agrees; only the stride differs.
    """

    def __init__(
        self,
        inner,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.inner = inner
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        # monkey-patch-free: shadow the index source the base class uses
        self._orig_epoch_indices = inner._epoch_indices
        inner._epoch_indices = self._sharded_epoch_indices
        # decorrelate per-batch draws (masking/aug) across hosts while the
        # shared seed keeps the epoch permutation pod-wide identical
        inner.rng_salt = self.process_index

    def _sharded_epoch_indices(self, epoch: int) -> np.ndarray:
        idx = self._orig_epoch_indices(epoch)
        return host_shard_indices(idx, self.process_index, self.process_count)

    def train_batches(self, start_step: int = 0) -> Iterator:
        return self.inner.train_batches(start_step=start_step)

    def eval_batches(self) -> Iterator:
        """Eval is NOT sharded: every host sees the full eval set (cheap, and
        retrieval/zero-shot metrics need the whole gallery on each host;
        ``DataModule.eval_batches`` iterates the dataset directly, bypassing
        ``_epoch_indices``, so no unsharding is needed here)."""
        return self.inner.eval_batches()

    def __iter__(self):
        return iter(self.train_batches())

    def __getattr__(self, name):
        return getattr(self.inner, name)
