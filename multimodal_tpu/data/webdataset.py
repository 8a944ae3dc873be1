"""WebDataset-style sharded-tar streaming input.

Large-scale multimodal pretraining corpora (LAION, DataComp, internal
crawls) ship as sequences of POSIX tar shards whose members group into
samples by basename: ``000123.jpg`` + ``000123.txt`` + ``000123.json`` is
one sample. Random-access datasets (``data/datasets.py``) cannot express
this — shards live on slow blob stores and must be read *sequentially* —
so this module provides the streaming half of the input pipeline:

- :class:`ShardedTarDataset` — iterate ``{__key__, ext: bytes}`` sample
  dicts from a list of shard paths, sequential reads only, one shard open
  at a time.
- :class:`IterableDataModule` — the streaming analog of
  ``datamodules.DataModule``: per-host shard assignment (disjoint strided
  shard slices — pod hosts never read each other's shards), per-epoch shard
  order shuffling, a bounded shuffle buffer (sample-level mixing without
  global random access), ``process``/``postprocess``/``collate`` override
  points shared with the map-style base, static-shape numpy batches, and
  background-thread prefetch.

The reference has no streaming input at all (its examples load HF datasets
into arrow memory maps); torch users reach for the external ``webdataset``
package — here it is a first-class citizen of the data layer because pod
training is bandwidth-fed by exactly this format.
"""

from __future__ import annotations

import os
import tarfile
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from multimodal_tpu.data.datamodules import _Prefetcher, _collate


class ShardedTarDataset:
    """Stream samples from tar shards, grouping members by basename key.

    Member name ``dir/000123.seg.jpg`` has key ``dir/000123`` and field
    ``seg.jpg`` (everything after the first dot, the webdataset
    convention). Members of one sample must be contiguous in the tar —
    true for every webdataset writer — so grouping needs one file handle
    and O(sample) memory.
    """

    def __init__(self, shards: Sequence[str]):
        if not shards:
            raise ValueError("no shards given")
        self.shards = list(shards)

    @staticmethod
    def _split_key(name: str):
        base = name.rstrip("/")
        d, fname = os.path.split(base)
        if "." not in fname:
            return base, ""
        stem, ext = fname.split(".", 1)
        return os.path.join(d, stem) if d else stem, ext

    def iter_shard(self, shard: str) -> Iterator[Dict[str, Any]]:
        current: Optional[str] = None
        sample: Dict[str, Any] = {}
        with tarfile.open(shard, "r|*") as tf:  # streaming mode: no seeks
            for member in tf:
                if not member.isfile():
                    continue
                key, ext = self._split_key(member.name)
                if key != current:
                    if current is not None and sample:
                        yield {"__key__": current, **sample}
                    current, sample = key, {}
                f = tf.extractfile(member)
                if f is not None:
                    sample[ext] = f.read()
        if current is not None and sample:
            yield {"__key__": current, **sample}

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for shard in self.shards:
            yield from self.iter_shard(shard)


def expand_shards(pattern_or_list) -> List[str]:
    """Accept a list of paths, a glob pattern, or a directory of .tar files."""
    import glob as _glob

    if isinstance(pattern_or_list, (list, tuple)):
        return list(pattern_or_list)
    p = str(pattern_or_list)
    if os.path.isdir(p):
        return sorted(
            os.path.join(p, f) for f in os.listdir(p) if f.endswith(".tar")
        )
    return sorted(_glob.glob(p))


class IterableDataModule:
    """Streaming datamodule over tar shards (webdataset layout).

    Parity of contract with ``DataModule``: deterministic given
    ``(seed, epoch)``, static-shape numpy batches, ``process`` returns the
    per-sample dict, ``postprocess`` sees the collated batch. Differences
    forced by streaming: shuffling is shard-order + a bounded reservoir
    (``shuffle_buffer``), and resume is shard-granular rather than exact
    (``start_step`` skips whole batches without running ``process``, but
    must still read the tar bytes — document-true, not hidden).

    Multi-host: ``process_index``/``process_count`` assign each host the
    strided shard slice ``shards[pi::pc]`` truncated to equal length, so no
    host ever opens another host's shards (sequential blob reads are the
    scarce resource) and every host yields the same number of batches per
    epoch (``len(shards)//pc`` must be >= 1).
    """

    def __init__(
        self,
        shards,
        batch_size: int = 8,
        shuffle_buffer: int = 0,
        seed: int = 0,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        decode: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
    ):
        shards = expand_shards(shards)
        per = len(shards) // process_count
        if per < 1:
            raise ValueError(
                f"{len(shards)} shards cannot feed {process_count} hosts"
            )
        self.all_shards = shards
        self.shards = shards[process_index::process_count][:per]
        self.batch_size = batch_size
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.prefetch = prefetch
        self.decode = decode
        # shared seed keeps shard assignment/permutation pod-consistent; the
        # per-batch salt decorrelates mask/aug draws across hosts
        self.rng_salt = process_index

    # -- override points (same contract as DataModule) ---------------------
    def process(self, sample: Dict[str, Any], rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        if self.decode is None:
            raise NotImplementedError(
                "pass decode= or subclass IterableDataModule.process"
            )
        return self.decode(sample)

    def postprocess(self, batch, rng):
        return batch

    def collate(self, samples):
        return _collate(samples)

    # -- iteration ----------------------------------------------------------
    def _epoch_samples(self, epoch: int) -> Iterator[Dict[str, Any]]:
        order = np.arange(len(self.shards))
        np.random.RandomState(self.seed + epoch).shuffle(order)
        stream = ShardedTarDataset([self.shards[i] for i in order])
        if self.shuffle_buffer <= 1:
            yield from stream
            return
        rng = np.random.RandomState((self.seed, epoch, 0))
        buf: List[Dict[str, Any]] = []
        for sample in stream:
            if len(buf) < self.shuffle_buffer:
                buf.append(sample)
                continue
            j = rng.randint(len(buf))
            yield buf[j]
            buf[j] = sample
        rng.shuffle(buf)
        yield from buf

    def _epoch_batches(self, epoch: int, skip: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield this epoch's batches after the first ``skip`` (skipped
        batches are not processed/collated; sets ``_last_epoch_batches`` to
        the epoch's total batch count for resume bookkeeping)."""
        bs = self.batch_size
        raw: List[Dict[str, Any]] = []
        n_batch = 0
        for sample in self._epoch_samples(epoch):
            raw.append(sample)
            if len(raw) < bs:
                continue
            batch_raw, raw = raw, []
            n_batch += 1
            if n_batch <= skip:
                continue
            # per-batch rng (seed, epoch, batch): augmentation identical
            # whether or not earlier batches were skipped on resume
            rng = np.random.RandomState(
                (self.seed, epoch, 1 + n_batch, self.rng_salt)
            )
            samples = [self.process(s, rng) for s in batch_raw]
            yield self.postprocess(self.collate(samples), rng)
        # drop_last semantics: ragged tail discarded (static shapes)
        self._last_epoch_batches = n_batch

    def train_batches(self, start_step: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite stream; ``start_step`` skips batches without running
        ``process`` (tar bytes are still read — streaming has no index)."""

        def gen():
            epoch, skip = 0, start_step
            while True:
                yield from self._epoch_batches(epoch, skip=skip)
                skip = max(0, skip - self._last_epoch_batches)
                epoch += 1

        if self.prefetch > 0:
            return _Prefetcher(gen, depth=self.prefetch)
        return gen()

    def eval_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        """One deterministic unshuffled pass over this host's shards."""
        rng = np.random.RandomState(self.seed)
        bs = self.batch_size
        raw: List[Dict[str, Any]] = []
        for sample in ShardedTarDataset(self.shards):
            raw.append(sample)
            if len(raw) == bs:
                samples = [self.process(s, rng) for s in raw]
                yield self.postprocess(self.collate(samples), rng)
                raw = []
        if raw:
            samples = [self.process(s, rng) for s in raw]
            yield self.postprocess(self.collate(samples), rng)

    def __iter__(self):
        return iter(self.train_batches())


class StreamingVLDataModule(IterableDataModule):
    """Image-text pretraining batches straight from webdataset shards.

    The streaming counterpart of ``datamodules.VLDataModule`` (same output
    contract: {image..., text, text_masked, mlm_labels, itm_labels}), with
    one forced difference: ITM negatives are drawn WITHIN the batch
    (caption swap between rows) because a stream has no random access to
    other samples. For the batch sizes this feeds (hundreds+), in-batch
    negatives are the standard formulation.
    """

    IMAGE_EXTS = ("jpg", "jpeg", "png", "webp")

    def __init__(
        self,
        shards,
        image_transform: Callable,
        text_transform: Callable,
        mlm_collator=None,
        itm_probability: float = 0.1,
        text_ext: str = "txt",
        jpeg_staging=None,
        **kwargs,
    ):
        super().__init__(shards, **kwargs)
        self.image_transform = image_transform
        self.text_transform = text_transform
        self.mlm_collator = mlm_collator
        self.itm_probability = itm_probability
        self.text_ext = text_ext
        self.jpeg_staging = jpeg_staging

    def _decode_image(self, sample):
        from multimodal_tpu.data.datamodules import _to_image

        for ext in self.IMAGE_EXTS:
            if ext in sample:
                blob = sample[ext]
                break
        else:
            raise KeyError(
                f"sample {sample.get('__key__')} has no image field "
                f"(looked for {self.IMAGE_EXTS})"
            )
        if self.jpeg_staging is not None and ext in ("jpg", "jpeg"):
            return _to_image(blob, self.jpeg_staging)
        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(blob)) as im:
            return im.convert("RGB").copy()

    def process(self, sample, rng):
        img = self.image_transform(self._decode_image(sample))
        out = dict(img) if isinstance(img, dict) else {"image": np.asarray(img)}
        text = sample[self.text_ext].decode("utf-8")
        out["text"] = (
            np.asarray(self.text_transform([text]))[0].astype(np.int32)
        )
        return out

    def postprocess(self, batch, rng):
        bs = len(batch["text"])
        itm = np.ones(bs, np.int32)
        if self.itm_probability > 0 and bs > 1:
            orig = batch["text"].copy()  # negatives come from ORIGINAL rows
            for i in range(bs):
                if rng.rand() >= self.itm_probability:
                    continue
                j = rng.randint(bs - 1)
                j += j >= i  # uniform over the other rows
                if not np.array_equal(orig[i], orig[j]):
                    batch["text"][i] = orig[j]
                    itm[i] = 0
        batch["itm_labels"] = itm
        if self.mlm_collator is not None:
            self.mlm_collator.rng = rng
            masked, labels = self.mlm_collator(batch["text"])
            batch["text_masked"] = masked.astype(np.int32)
            batch["mlm_labels"] = labels.astype(np.int32)
        return batch
