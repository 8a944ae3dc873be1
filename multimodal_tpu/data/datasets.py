"""Dataset loading helpers.

Parity surface: the reference builds HF datasets by hub name
(``examples/flava/native/data.py:52`` — wit/imagenet/bookcorpus) and
torchvision folder datasets (omnivore). Here one loader covers the zero-egress
cases first: an on-disk arrow dataset (``datasets.save_to_disk`` output), a
jsonl/json file, an image folder, and only then a hub name (requires network).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence


class ListDataset:
    """Minimal indexable dataset over a list of dict samples (test/debug)."""

    def __init__(self, samples: Sequence[Dict[str, Any]]):
        self.samples = list(samples)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        return self.samples[i]


def _load_jsonl(path: str) -> ListDataset:
    samples: List[Dict[str, Any]] = []
    with open(path) as f:
        if path.endswith(".json"):
            data = json.load(f)
            samples = data if isinstance(data, list) else data["data"]
        else:
            for line in f:
                line = line.strip()
                if line:
                    samples.append(json.loads(line))
    return ListDataset(samples)


def _load_imagefolder(path: str, split: Optional[str]) -> ListDataset:
    """class-per-subdirectory layout -> {image: path, label: int, classname}."""
    root = os.path.join(path, split) if split and os.path.isdir(os.path.join(path, split)) else path
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    samples = []
    for label, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".npy")):
                samples.append(
                    {"image": os.path.join(cdir, fname), "label": label, "classname": cls}
                )
    return ListDataset(samples)


def load_dataset(
    path_or_name: str,
    split: str = "train",
    **kwargs,
):
    """Resolve a dataset from (in priority order):

    1. a ``datasets.save_to_disk`` directory (arrow) — ``load_from_disk``
    2. a ``.json`` / ``.jsonl`` file of samples
    3. an image-folder directory (class-per-subdir)
    4. a HF hub name (network required — fails cleanly without egress)
    """
    if os.path.isdir(path_or_name):
        # arrow dir? (has dataset_info.json / state.json at top or per-split)
        candidates = [path_or_name, os.path.join(path_or_name, split)]
        for c in candidates:
            if os.path.exists(os.path.join(c, "state.json")):
                import datasets as hf_datasets

                ds = hf_datasets.load_from_disk(c)
                if hasattr(ds, "keys") and split in getattr(ds, "keys", lambda: [])():
                    ds = ds[split]
                return ds
        if os.path.exists(os.path.join(path_or_name, "dataset_dict.json")):
            import datasets as hf_datasets

            return hf_datasets.load_from_disk(path_or_name)[split]
        return _load_imagefolder(path_or_name, split)
    if os.path.isfile(path_or_name):
        return _load_jsonl(path_or_name)
    import datasets as hf_datasets

    return hf_datasets.load_dataset(path_or_name, split=split, **kwargs)
