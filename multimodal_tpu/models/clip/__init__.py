from multimodal_tpu.models.clip.model import (
    CLIP,
    CLIPOutput,
    clip_vit_b16,
    clip_vit_b32,
    clip_vit_l14,
)

__all__ = ["CLIP", "CLIPOutput", "clip_vit_b16", "clip_vit_b32", "clip_vit_l14"]
