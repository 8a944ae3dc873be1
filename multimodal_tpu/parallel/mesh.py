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
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Optional[Tuple[str, ...]] = None,
) -> Mesh:
    """Create a Mesh over available devices.

    Any one of dp/fsdp/tp/cp may be -1 to absorb the remaining devices.
    Axes of size 1 are kept (they cost nothing and keep PartitionSpecs
    uniform across configurations).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = {"dp": dp, "fsdp": fsdp, "tp": tp, "cp": cp}
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
    names = axis_names or ("dp", "fsdp", "tp", "cp")
    shape = tuple(sizes[k] for k in ("dp", "fsdp", "tp", "cp"))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch dim over the dp and fsdp axes jointly."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
