"""Multi-task data loading.

Parity with reference ``examples/common/data/multidata.py``
(MultiDataLoader:16, MultiDataModule:138): cycle several loaders with a
per-batch sampling function, re-igniting exhausted iterators.

TPU-native determinism: the reference broadcasts the loader choice to all
ranks with ``dist.broadcast_object_list`` (:117-126); here the choice is a
DETERMINISTIC function of (seed, step) so every host computes the same
choice with no collective at all (SURVEY §7 step 5).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np


def round_robin_sampling(step: int, num_loaders: int, seed: int = 0) -> int:
    return step % num_loaders


def make_weighted_sampling(weights: Sequence[float]) -> Callable[[int, int, int], int]:
    w = np.asarray(weights, np.float64)
    w = w / w.sum()

    def sample(step: int, num_loaders: int, seed: int = 0) -> int:
        rng = np.random.RandomState((seed * 1_000_003 + step) % (2 ** 31))
        return int(rng.choice(num_loaders, p=w))

    return sample


class MultiDataLoader:
    """Cycle several iterables, one batch at a time.

    Args:
        loaders: named iterables yielding batches.
        sampling_fn: (step, num_loaders, seed) -> loader index.
        seed: determinism seed shared by all hosts.
    """

    def __init__(
        self,
        loaders: Dict[str, Iterable],
        sampling_fn: Callable[[int, int, int], int] = round_robin_sampling,
        seed: int = 0,
    ):
        self.names = list(loaders.keys())
        self.loaders = loaders
        self.sampling_fn = sampling_fn
        self.seed = seed
        self.current_name: Optional[str] = None
        self._step = 0
        self._iters: Dict[str, Any] = {}

    def __iter__(self):
        self._iters = {name: iter(l) for name, l in self.loaders.items()}
        self._step = 0
        return self

    def _next_from(self, name: str):
        try:
            return next(self._iters[name])
        except StopIteration:
            # re-ignite exhausted iterator (reference :99-107)
            self._iters[name] = iter(self.loaders[name])
            return next(self._iters[name])

    def __next__(self):
        idx = self.sampling_fn(self._step, len(self.names), self.seed)
        self.current_name = self.names[idx]
        self._step += 1
        return self.current_name, self._next_from(self.current_name)
