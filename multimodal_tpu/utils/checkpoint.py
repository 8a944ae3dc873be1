"""PyTorch-checkpoint → Flax-params converters.

Replaces the reference's URL-based pretrained loading
(``utils/common.py:99-107`` load_module_from_url + per-model checkpoint
maps, e.g. ``models/clip/model.py:24-33``): here checkpoints are converted
once into Flax param pytrees (then saved/restored with orbax — see
``multimodal_tpu.training.checkpoint``).

torch is an optional dependency: only needed when actually converting.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t2j(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _t2j(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t2j(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t2j(sd[f"{prefix}.weight"]), "bias": _t2j(sd[f"{prefix}.bias"])}


def _fp32_layernorm(sd: Mapping, prefix: str) -> Dict[str, Any]:
    # Fp32LayerNorm wraps an inner nn.LayerNorm auto-named LayerNorm_0.
    return {"LayerNorm_0": _layernorm(sd, prefix)}


def _conv2d_nchw(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    out = {"kernel": _t2j(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t2j(sd[f"{prefix}.bias"])
    return out


def _embedding(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": _t2j(sd[f"{prefix}.weight"])}


def _clip_encoder_stack(sd: Mapping, prefix: str, n_layers: int) -> Dict[str, Any]:
    """torch nn.TransformerEncoder(layers.N.{self_attn,linear1,linear2,norm1,norm2})."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "in_proj": {
                "kernel": _t2j(sd[f"{p}.self_attn.in_proj_weight"]).T,
                "bias": _t2j(sd[f"{p}.self_attn.in_proj_bias"]),
            },
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    return out


def clip_vit_encoder_params_from_torch(sd: Mapping, prefix: str = "", n_layers: int = 12) -> Dict[str, Any]:
    """Convert reference CLIPViTEncoder state dict (models/clip/image_encoder.py:22)."""
    p = prefix
    return {
        "conv": _conv2d_nchw(sd, f"{p}conv", bias=False),
        "cls_token_embedding": _t2j(sd[f"{p}cls_token_embedding"]),
        "positional_embedding": _t2j(sd[f"{p}positional_embedding"]),
        "ln_pre": _fp32_layernorm(sd, f"{p}ln_pre"),
        "encoder": _clip_encoder_stack(sd, f"{p}encoder", n_layers),
        "ln_post": _fp32_layernorm(sd, f"{p}ln_post"),
        "projection": _t2j(sd[f"{p}projection"]),
    }


def clip_text_encoder_params_from_torch(sd: Mapping, prefix: str = "", n_layers: int = 12) -> Dict[str, Any]:
    """Convert reference CLIPTextEncoder state dict (models/clip/text_encoder.py:15)."""
    p = prefix
    return {
        "token_embedding": _embedding(sd, f"{p}token_embedding"),
        "positional_embedding": _t2j(sd[f"{p}positional_embedding"]),
        "encoder": _clip_encoder_stack(sd, f"{p}encoder", n_layers),
        "ln_final": _fp32_layernorm(sd, f"{p}ln_final"),
        "projection": _linear(sd, f"{p}projection", bias=False),
    }


def clip_params_from_torch(
    state_dict: Mapping, n_vision_layers: int = 12, n_text_layers: int = 12
) -> Dict[str, Any]:
    """Full reference CLIP (encoder_a = ViT, encoder_b = text) → Flax params."""
    return {
        "params": {
            "encoder_a": clip_vit_encoder_params_from_torch(
                state_dict, "encoder_a.", n_vision_layers
            ),
            "encoder_b": clip_text_encoder_params_from_torch(
                state_dict, "encoder_b.", n_text_layers
            ),
        }
    }


def load_torch_checkpoint(path: str) -> Mapping:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, Mapping) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return ckpt
