from multimodal_tpu.quantization.weight_only import (
    QuantizedLeaf,
    QuantizedModule,
    dequantize_tree,
    quantization_error,
    quantize_tree,
    size_bytes,
)

__all__ = [
    "QuantizedLeaf",
    "QuantizedModule",
    "dequantize_tree",
    "quantization_error",
    "quantize_tree",
    "size_bytes",
]
