"""Multi-host input pipeline on the 8-device virtual mesh.

Validates the pod-scale data contract (data/multihost.py): disjoint
equal-length per-process epoch slices (DistributedSampler analog), global
jax.Array assembly from process-local data, and the Trainer's multihost H2D
path producing bit-identical training to the single-host path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_tpu.data.datamodules import DataModule
from multimodal_tpu.data.multihost import (
    HostShardedDataModule,
    global_batch_put,
    host_shard_indices,
    local_batch_size,
)
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.parallel.sharding import batch_sharding
from multimodal_tpu.training.trainer import Trainer

from tests.test_utils import rng


def test_host_shard_indices_disjoint_cover_equal():
    for n, pc in [(100, 4), (17, 3), (8, 8), (64, 1)]:
        perm = np.random.RandomState(0).permutation(n)
        shards = [host_shard_indices(perm, pi, pc) for pi in range(pc)]
        lengths = {len(s) for s in shards}
        assert lengths == {n // pc}  # equal-length on every host
        flat = np.concatenate(shards)
        assert len(np.unique(flat)) == len(flat)  # disjoint
        assert set(flat.tolist()) <= set(perm.tolist())


def test_local_batch_size():
    assert local_batch_size(64, 8) == 8
    try:
        local_batch_size(10, 4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_global_batch_put_matches_device_put():
    """Single-process, make_array_from_process_local_data == sharded
    device_put; the same code path a pod uses runs on the virtual mesh."""
    mesh = create_mesh(dp=4, fsdp=2, tp=1)
    sharding = batch_sharding(mesh)
    batch = {
        "x": np.random.RandomState(0).randn(16, 8).astype(np.float32),
        "y": np.arange(16, dtype=np.int32),
    }
    out = global_batch_put(batch, sharding)
    ref = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch
    )
    for k in batch:
        assert out[k].shape == batch[k].shape
        assert out[k].sharding.is_equivalent_to(ref[k].sharding, out[k].ndim)
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])


class _IdentityDM(DataModule):
    def process(self, sample, rng):
        return {"i": np.asarray(sample, dtype=np.int64)}


def test_host_sharded_datamodule_partitions_epoch():
    data = list(range(20))
    dms = [
        HostShardedDataModule(
            _IdentityDM(data, batch_size=2, shuffle=True, seed=3, prefetch=0),
            process_index=pi, process_count=2,
        )
        for pi in range(2)
    ]
    epochs = []
    for dm in dms:
        seen = []
        for batch in dm.inner._epoch_batches(epoch=0):
            seen.extend(batch["i"].tolist())
        epochs.append(seen)
    assert len(epochs[0]) == len(epochs[1]) == 10
    assert not set(epochs[0]) & set(epochs[1])  # disjoint across hosts
    assert set(epochs[0]) | set(epochs[1]) == set(range(20))
    # same shared permutation: re-building host 0 gives the same order
    again = HostShardedDataModule(
        _IdentityDM(data, batch_size=2, shuffle=True, seed=3, prefetch=0),
        process_index=0, process_count=2,
    )
    seen = []
    for batch in again.inner._epoch_batches(epoch=0):
        seen.extend(batch["i"].tolist())
    assert seen == epochs[0]


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(4)(nn.relu(nn.Dense(16)(x)))


def _data(n, batch=16):
    r = np.random.RandomState(1)
    w = r.randn(8, 4).astype(np.float32)
    for _ in range(n):
        x = r.randn(batch, 8).astype(np.float32)
        yield {"x": x, "y": x @ w}


def test_trainer_multihost_path_matches_single_host(tmp_path):
    """Trainer(multihost=True) (global_batch_put H2D) trains bit-identically
    to the default sharded-device_put path on the same data."""
    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    model = _Tiny()
    params = model.init(rng(0), jnp.zeros((1, 8)))

    def loss_fn(params, batch, _rng):
        pred = model.apply(params, batch["x"])
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {}

    losses = {}
    for multihost in (False, True):
        trainer = Trainer(
            loss_fn, optax.adam(1e-2), strategy="fsdp", mesh=mesh,
            multihost=multihost,
        )
        state = trainer.restore_or_init(
            jax.tree_util.tree_map(jnp.array, params)
        )
        state = trainer.fit(state, _data(5), num_steps=5)
        batch = next(_data(1))
        dev_batch = trainer.shard_batch(batch)
        pred = model.apply(state["params"], dev_batch["x"])
        losses[multihost] = np.asarray(
            jnp.mean((pred - dev_batch["y"]) ** 2)
        )
    np.testing.assert_array_equal(losses[False], losses[True])
