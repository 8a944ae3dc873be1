"""Host-side datamodules producing static-shape numpy batches.

Parity surface: reference ``examples/flava/data/datamodules.py`` (Lightning
``ImageDataModule``/``MLMDataModule``/``VLDataModule``) and
``examples/flava/native/data.py`` (the raw-loop equivalents). The TPU design
differs where it should: batches are plain numpy dicts with *static shapes*
(so the jitted step never recompiles), shuffling is a deterministic per-epoch
permutation (resume-safe, no sampler state object), and an optional
background thread overlaps host transform work with device steps — the JAX
analog of the torch DataLoader worker pool.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np


def _to_image(x, jpeg_staging=None) -> "np.ndarray | Any":
    """Resolve a sample's image field: path/bytes -> image, keep PIL/ndarray.

    With ``jpeg_staging=(H, W)``, JPEG paths and raw JPEG bytes decode
    through the native libjpeg kernel (``native/jpeg_decoder.cpp``:
    DCT-domain scaling + area resize) straight to a (H, W, 3) uint8 staging
    array for the on-device fused resize/normalize/patchify pipeline."""
    is_jpeg_path = isinstance(x, str) and x.lower().endswith((".jpg", ".jpeg"))
    if jpeg_staging is not None and (isinstance(x, bytes) or is_jpeg_path):
        from multimodal_tpu.native.jpeg import decode_jpeg_batch

        blob = x if isinstance(x, bytes) else open(x, "rb").read()
        return decode_jpeg_batch([blob], *jpeg_staging)[0]
    if isinstance(x, str):
        if x.endswith(".npy"):
            return np.load(x)
        from PIL import Image

        with Image.open(x) as im:
            return im.convert("RGB").copy()
    return x


def _collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        out[key] = np.stack([np.asarray(s[key]) for s in samples])
    return out


class _Prefetcher:
    """Bounded background-thread prefetch over a batch iterator."""

    def __init__(self, make_iter: Callable[[], Iterator], depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in make_iter():
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class DataModule:
    """Base: deterministic epoch shuffling + batching + prefetch.

    Subclasses implement ``process(sample, rng) -> dict[str, np.ndarray]``
    and optionally ``postprocess(batch, rng)`` for batch-level work (MLM
    masking, ITM negative construction).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 8,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        # Per-batch rng salt. The SEED must be shared across hosts (the epoch
        # permutation has to agree pod-wide), but per-batch draws (MLM mask
        # positions, ITM swap coins, augmentations) must NOT repeat on every
        # host — multihost wrappers set this to jax.process_index() so each
        # host's slice of the global batch gets independent randomness.
        self.rng_salt = 0

    # -- override points ---------------------------------------------------
    def process(self, sample: Dict[str, Any], rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def postprocess(
        self, batch: Dict[str, np.ndarray], rng: np.random.RandomState
    ) -> Dict[str, np.ndarray]:
        return batch

    def collate(self, samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        """Stack per-key; override for ragged fields (e.g. padded images)."""
        return _collate(samples)

    # -- iteration ----------------------------------------------------------
    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        return idx

    def _epoch_batches(
        self, epoch: int, start_batch: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        # Per-BATCH rng keyed on (seed, epoch, offset): batch b of epoch e
        # is a pure function of the config, independent of how many batches
        # were consumed before it — this is what makes mid-epoch resume
        # (``train_batches(start_step=...)``) exact rather than approximate.
        idx = self._epoch_indices(epoch)
        bs = self.batch_size
        end = len(idx) - (len(idx) % bs) if self.drop_last else len(idx)
        for start in range(start_batch * bs, end, bs):
            chunk = idx[start : start + bs]
            if self.drop_last and len(chunk) < bs:
                break
            rng = np.random.RandomState((self.seed, epoch, start, self.rng_salt))
            samples = [self.process(self.dataset[int(i)], rng) for i in chunk]
            yield self.postprocess(self.collate(samples), rng)

    def batches_per_epoch(self) -> int:
        # via _epoch_indices so host-sharded wrappers are counted correctly
        n = len(self._epoch_indices(0))
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def eval_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        """One deterministic unshuffled pass (may yield a ragged tail)."""
        rng = np.random.RandomState(self.seed)
        bs = self.batch_size
        for start in range(0, len(self.dataset), bs):
            n = min(bs, len(self.dataset) - start)
            samples = [self.process(self.dataset[start + i], rng) for i in range(n)]
            yield self.postprocess(self.collate(samples), rng)

    def train_batches(self, start_step: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite stream, re-shuffled each epoch, prefetched off-thread.

        ``start_step`` fast-forwards the stream to global batch number
        ``start_step`` by index arithmetic (no samples are processed for the
        skipped batches), so checkpoint auto-resume continues on EXACTLY the
        data the interrupted run would have seen next — the reference's
        Lightning stack only approximates this (epoch-granularity restart).
        """
        per_epoch = max(self.batches_per_epoch(), 1)
        first_epoch, first_batch = divmod(start_step, per_epoch)

        def gen():
            epoch, start = first_epoch, first_batch
            while True:
                yield from self._epoch_batches(epoch, start_batch=start)
                epoch, start = epoch + 1, 0

        if self.prefetch > 0:
            return _Prefetcher(gen, depth=self.prefetch)
        return gen()

    def __iter__(self):
        return iter(self.train_batches())


class ImageDataModule(DataModule):
    """Images (+ integer labels): ImageNet-style classification / eval.

    Parity: reference ``ImageDataModule`` (``datamodules.py``) — but the
    default transform only decodes/arranges uint8 HWC on the host and leaves
    resize/normalize to the on-device fused pipeline.
    """

    def __init__(
        self,
        dataset,
        image_transform: Optional[Callable] = None,
        image_key: str = "image",
        label_key: str = "label",
        jpeg_staging=None,
        **kwargs,
    ):
        super().__init__(dataset, **kwargs)
        self.image_transform = image_transform
        self.image_key = image_key
        self.label_key = label_key
        self.jpeg_staging = jpeg_staging

    def process(self, sample, rng):
        img = _to_image(sample[self.image_key], self.jpeg_staging)
        if self.image_transform is not None:
            img = self.image_transform(img)
        out = img if isinstance(img, dict) else {"image": np.asarray(img)}
        if self.label_key in sample:
            out["labels"] = np.asarray(sample[self.label_key], dtype=np.int32)
        return out


class MLMDataModule(DataModule):
    """Text-only MLM batches: {text, text_masked, mlm_labels}.

    Parity: reference ``MLMDataModule`` over bookcorpus with the HF MLM
    collator (``native/data.py:274``).
    """

    def __init__(
        self,
        dataset,
        text_transform: Callable[[Sequence[str]], np.ndarray],
        mlm_collator,
        text_key: str = "text",
        **kwargs,
    ):
        super().__init__(dataset, **kwargs)
        self.text_transform = text_transform
        self.mlm_collator = mlm_collator
        self.text_key = text_key

    def process(self, sample, rng):
        ids = np.asarray(self.text_transform([sample[self.text_key]]))[0]
        return {"text": ids.astype(np.int32)}

    def postprocess(self, batch, rng):
        self.mlm_collator.rng = rng
        masked, labels = self.mlm_collator(batch["text"])
        return {
            "text": batch["text"],
            "text_masked": masked.astype(np.int32),
            "mlm_labels": labels.astype(np.int32),
        }


class VLDataModule(DataModule):
    """Image-text pairs for contrastive/matching pretraining.

    Produces {image..., text, text_masked, mlm_labels, itm_labels}: with
    probability ``itm_probability`` a sample's text is swapped with another
    dataset caption and its ITM label set to 0 (the reference VLDataModule's
    negative-pair construction). MLM masking applies to whichever text ends
    up paired; the FLAVA loss itself gates the MMM/contrastive terms on
    itm_labels, so no special-casing is needed here.
    """

    def __init__(
        self,
        dataset,
        image_transform: Callable,
        text_transform: Callable[[Sequence[str]], np.ndarray],
        mlm_collator=None,
        itm_probability: float = 0.1,
        image_key: str = "image",
        text_key: str = "text",
        jpeg_staging=None,
        **kwargs,
    ):
        super().__init__(dataset, **kwargs)
        self.image_transform = image_transform
        self.text_transform = text_transform
        self.mlm_collator = mlm_collator
        self.itm_probability = itm_probability
        self.image_key = image_key
        self.text_key = text_key
        self.jpeg_staging = jpeg_staging

    def process(self, sample, rng):
        text = sample[self.text_key]
        itm_label = 1
        if self.itm_probability > 0 and rng.rand() < self.itm_probability:
            # resample until the drawn caption differs from this sample's —
            # pairing an image with its own (or an identical) caption while
            # labeling itm=0 would be a mislabeled negative (the reference's
            # negative-pair construction draws a *different* sample)
            for _ in range(10):
                j = rng.randint(len(self.dataset))
                neg_text = self.dataset[int(j)][self.text_key]
                if neg_text != text:
                    text = neg_text
                    itm_label = 0
                    break
        img = self.image_transform(_to_image(sample[self.image_key], self.jpeg_staging))
        out = dict(img) if isinstance(img, dict) else {"image": np.asarray(img)}
        ids = np.asarray(self.text_transform([text]))[0]
        out["text"] = ids.astype(np.int32)
        out["itm_labels"] = np.asarray(itm_label, dtype=np.int32)
        return out

    def postprocess(self, batch, rng):
        if self.mlm_collator is not None:
            self.mlm_collator.rng = rng
            masked, labels = self.mlm_collator(batch["text"])
            batch["text_masked"] = masked.astype(np.int32)
            batch["mlm_labels"] = labels.astype(np.int32)
        return batch
