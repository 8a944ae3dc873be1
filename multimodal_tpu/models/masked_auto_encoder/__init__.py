from multimodal_tpu.models.masked_auto_encoder.model import (
    MaskedAutoEncoder,
    MAEOutput,
    audio_mae,
    image_mae,
    vit_b_16_audio_mae,
    vit_l_16_image_mae,
    vit_s_16_audio_mae,
    vit_l_16_audio_mae,
)

__all__ = [
    "MaskedAutoEncoder",
    "MAEOutput",
    "audio_mae",
    "image_mae",
    "vit_b_16_audio_mae",
    "vit_l_16_image_mae",
    "vit_s_16_audio_mae",
    "vit_l_16_audio_mae",
]
