"""Real-data input pipeline (host side).

TPU-native replacement for the reference's example data layers
(``examples/flava/data/datamodules.py``, ``examples/flava/native/data.py``,
``examples/common/data/multidata.py``): datasets load on the host (HF
``datasets`` from disk or hub, image folders, jsonl), transforms run as
numpy on the host workers, and batches come out as static-shape numpy dicts
ready for ``Trainer.shard_batch``'s single H2D put. Heavy image work that
the reference does in torchvision C++ stays on-device here
(``ops/image.fused_preprocess_for_encoder``).
"""

from multimodal_tpu.data.datamodules import (
    DataModule,
    ImageDataModule,
    MLMDataModule,
    VLDataModule,
)
from multimodal_tpu.data.datasets import load_dataset
from multimodal_tpu.data.device_prefetch import device_prefetch
from multimodal_tpu.data.imagenet_zeroshot import (
    imagenet_classnames,
    imagenet_templates,
)
from multimodal_tpu.data.multihost import (
    HostShardedDataModule,
    global_batch_put,
    host_shard_indices,
    local_batch_size,
)
from multimodal_tpu.data.webdataset import (
    IterableDataModule,
    ShardedTarDataset,
    StreamingVLDataModule,
    expand_shards,
)

__all__ = [
    "IterableDataModule",
    "ShardedTarDataset",
    "StreamingVLDataModule",
    "expand_shards",
    "HostShardedDataModule",
    "global_batch_put",
    "host_shard_indices",
    "local_batch_size",
    "DataModule",
    "ImageDataModule",
    "MLMDataModule",
    "VLDataModule",
    "load_dataset",
    "device_prefetch",
    "imagenet_classnames",
    "imagenet_templates",
]
