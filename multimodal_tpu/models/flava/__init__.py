from multimodal_tpu.models.flava.model import (
    FLAVAModel,
    FLAVAForClassification,
    FLAVAForPreTraining,
    flava_model,
    flava_model_for_classification,
    flava_model_for_pretraining,
)

__all__ = [
    "FLAVAModel",
    "FLAVAForClassification",
    "FLAVAForPreTraining",
    "flava_model",
    "flava_model_for_classification",
    "flava_model_for_pretraining",
]
