from multimodal_tpu.models.coca.coca_model import (
    CoCaForPretraining,
    CoCaModel,
    MultimodalOutput,
    coca_vit,
    coca_vit_b_32,
    coca_vit_l_14,
    coca_for_pretraining,
)

__all__ = [
    "CoCaForPretraining",
    "CoCaModel",
    "MultimodalOutput",
    "coca_vit",
    "coca_vit_b_32",
    "coca_vit_l_14",
    "coca_for_pretraining",
]
