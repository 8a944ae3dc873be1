"""Multi-slice (DCN) hybrid mesh: outer dcn data-parallel axis over slices,
inner ICI axes within each slice (SURVEY §7 step 11). On the virtual CPU
backend there is no real DCN topology, so these tests exercise the layout,
axis-name plumbing, and numerical equivalence of a train step under the
hybrid mesh vs a single device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_tpu.parallel.mesh import batch_sharding, create_hybrid_mesh
from multimodal_tpu.parallel.sharding import tp_sharding

from tests.test_utils import assert_expected


def test_hybrid_mesh_shape_and_axes():
    mesh = create_hybrid_mesh(dcn_dp=2, dp=1, fsdp=2, tp=2, devices=jax.devices()[:8])
    assert mesh.axis_names == ("dcn", "dp", "fsdp", "tp", "cp")
    assert dict(mesh.shape) == {"dcn": 2, "dp": 1, "fsdp": 2, "tp": 2, "cp": 1}
    spec = batch_sharding(mesh).spec
    assert spec == P(("dcn", "dp", "fsdp"))


def test_hybrid_mesh_train_step_matches_single_device():
    mesh = create_hybrid_mesh(dcn_dp=2, dp=1, fsdp=2, tp=2, devices=jax.devices()[:8])
    rng = np.random.RandomState(0)
    w1 = rng.randn(16, 64).astype(np.float32) * 0.1
    w2 = rng.randn(64, 16).astype(np.float32) * 0.1
    params = {"linear1": {"kernel": jnp.asarray(w1)}, "linear2": {"kernel": jnp.asarray(w2)}}
    x = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 16).astype(np.float32))

    def loss_fn(p, x, y):
        h = jnp.tanh(x @ p["linear1"]["kernel"])
        return jnp.mean((h @ p["linear2"]["kernel"] - y) ** 2)

    opt = optax.sgd(0.1)

    def step(p, o, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    # single device
    p1, o1, loss1 = jax.jit(step)(params, opt.init(params), x, y)

    # hybrid mesh: params tp/fsdp-sharded, batch over (dcn, dp, fsdp)
    shardings = tp_sharding(params, mesh, min_weight_size=1)
    p_sh = jax.device_put(params, shardings)
    x_sh = jax.device_put(x, batch_sharding(mesh))
    y_sh = jax.device_put(y, batch_sharding(mesh))
    # at least one param must actually land on the tp axis
    tp_specs = [
        s.spec for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda l: isinstance(l, NamedSharding))
        if any("tp" in ((e,) if isinstance(e, str) else (e or ())) for e in s.spec)
    ]
    assert tp_specs, "tp axis carries no parameters on the hybrid mesh"
    with mesh:
        p2, o2, loss2 = jax.jit(step)(p_sh, opt.init(p_sh), x_sh, y_sh)
    assert_expected(loss2, loss1, rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: assert_expected(jax.device_get(a), jax.device_get(b), rtol=1e-5, atol=1e-6),
        p2, p1,
    )


def test_hybrid_mesh_single_slice_fallback():
    # dcn_dp=1 degenerates to a normal single-slice mesh and still works
    mesh = create_hybrid_mesh(dcn_dp=1, dp=2, fsdp=4, tp=1, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {"dcn": 1, "dp": 2, "fsdp": 4, "tp": 1, "cp": 1}
