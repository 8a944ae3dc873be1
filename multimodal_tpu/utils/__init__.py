from multimodal_tpu.utils.common import (
    ModelOutput,
    shift_dim,
    tensor_slice,
    to_tuple_tuple,
)

__all__ = ["ModelOutput", "shift_dim", "tensor_slice", "to_tuple_tuple"]
