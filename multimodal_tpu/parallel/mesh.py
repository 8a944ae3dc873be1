"""Device-mesh construction helpers.

TPU-native replacement for the reference's torchrun/NCCL process-group setup
(``examples/flava/native/train.py:92-121``, ``examples/mdetr/utils/dist.py``).
One mesh, named axes; shardings are NamedShardings over these axes and XLA
inserts the collectives (GSPMD).

Axis conventions used across the framework:
  - ``dp``:   data parallel (batch dim)
  - ``fsdp``: parameter sharding (ZeRO-3 analog; also used for batch)
  - ``tp``:   tensor parallel (hidden / heads)
  - ``cp``:   context parallel (sequence dim; new capability vs reference)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh_axes() -> Tuple[str, ...]:
    return ("dp", "fsdp", "tp")


def create_mesh(
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    cp: int = 1,
    ep: int = 1,
    pp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Optional[Tuple[str, ...]] = None,
) -> Mesh:
    """Create a Mesh over available devices.

    Any one of dp/fsdp/tp/cp/ep/pp may be -1 to absorb the remaining
    devices. Axes of size 1 are dropped from the mesh unless they are in
    the dp/fsdp/tp/cp core (kept for PartitionSpec uniformity across
    existing configurations); the newer ep/pp axes only appear when used.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    order = ("dp", "fsdp", "tp", "cp", "ep", "pp")
    sizes = {"dp": dp, "fsdp": fsdp, "tp": tp, "cp": cp, "ep": ep, "pp": pp}
    unknown = [k for k, v in sizes.items() if v == -1]
    if len(unknown) > 1:
        raise ValueError("only one axis may be -1")
    if unknown:
        known = int(np.prod([v for v in sizes.values() if v != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[unknown[0]] = n // known
    total = int(np.prod(list(sizes.values())))
    if total != n:
        raise ValueError(f"mesh {sizes} needs {total} devices, have {n}")
    if axis_names is not None:
        names = axis_names
        kept = order[: len(names)]
    else:
        kept = tuple(
            k for k in order
            if k in ("dp", "fsdp", "tp", "cp") or sizes[k] > 1
        )
        names = kept
    shape = tuple(sizes[k] for k in kept)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def create_hybrid_mesh(
    dcn_dp: int,
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    cp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    allow_split_physical_axes: bool = False,
) -> Mesh:
    """Multi-slice mesh: an outer ``dcn`` data-parallel axis over the
    slow inter-slice DCN network, inner dp/fsdp/tp/cp axes over each
    slice's ICI (SURVEY §7 step 11 — pods, not just one slice).

    Lays devices out with ``mesh_utils.create_hybrid_device_mesh`` so only
    gradient all-reduces (dp traffic) cross DCN, while parameter
    all-gathers / tp collectives ride ICI within each slice. On hosts
    without real multi-slice topology (CPU virtual devices, single slice)
    falls back to a plain reshape with the same axis names, keeping tests
    and dryruns runnable anywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % dcn_dp:
        raise ValueError(f"{n} devices not divisible by dcn_dp={dcn_dp}")
    per_slice = n // dcn_dp
    sizes = {"dp": dp, "fsdp": fsdp, "tp": tp, "cp": cp}
    unknown = [k for k, v in sizes.items() if v == -1]
    if len(unknown) > 1:
        raise ValueError("only one axis may be -1")
    if unknown:
        known = int(np.prod([v for v in sizes.values() if v != -1]))
        if per_slice % known:
            raise ValueError(f"{per_slice} per-slice devices not divisible by {known}")
        sizes[unknown[0]] = per_slice // known
    ici_shape = tuple(sizes[k] for k in ("dp", "fsdp", "tp", "cp"))
    if int(np.prod(ici_shape)) != per_slice:
        raise ValueError(f"per-slice mesh {sizes} needs {np.prod(ici_shape)}, have {per_slice}")
    names = ("dcn", "dp", "fsdp", "tp", "cp")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=ici_shape,
            dcn_mesh_shape=(dcn_dp, 1, 1, 1),
            devices=devices,
            allow_split_physical_axes=allow_split_physical_axes,
        ).reshape((dcn_dp,) + ici_shape)
    except (ValueError, AssertionError):
        # single-slice / virtual-device fallback: no process boundaries to
        # optimize for, a contiguous reshape is the right layout
        dev_array = np.asarray(devices).reshape((dcn_dp,) + ici_shape)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch dim over the data-parallel axes (incl. a dcn axis when
    the mesh is multi-slice) and fsdp jointly."""
    axes = tuple(a for a in ("dcn", "dp", "fsdp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
