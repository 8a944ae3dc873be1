from multimodal_tpu.parallel.collectives import (
    BackpropType,
    all_gather_with_backprop_type,
    concat_gather,
    get_axis_index,
)
from multimodal_tpu.parallel.mesh import create_mesh, default_mesh_axes

__all__ = [
    "BackpropType",
    "all_gather_with_backprop_type",
    "concat_gather",
    "get_axis_index",
    "create_mesh",
    "default_mesh_axes",
]
