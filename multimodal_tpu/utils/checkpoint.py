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


def _fused_qkv(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """Separate torch q/k/v linears -> one fused (E, 3E) kernel."""
    kernel = np.concatenate(
        [
            _t2j(sd[f"{prefix}.query.weight"]).T,
            _t2j(sd[f"{prefix}.key.weight"]).T,
            _t2j(sd[f"{prefix}.value.weight"]).T,
        ],
        axis=1,
    )
    bias = np.concatenate(
        [
            _t2j(sd[f"{prefix}.query.bias"]),
            _t2j(sd[f"{prefix}.key.bias"]),
            _t2j(sd[f"{prefix}.value.bias"]),
        ]
    )
    return {"kernel": kernel, "bias": bias}


def _flava_encoder_layers(sd: Mapping, prefix: str, n_layers: int) -> Dict[str, Any]:
    """Reference FLAVA-variant TransformerEncoder (models/flava/transformer.py)
    -> framework TransformerEncoder params (fused QKV)."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"{prefix}.layer.{i}"
        out[f"layer_{i}"] = {
            "attention": {
                "input_proj": _fused_qkv(sd, f"{p}.attention"),
                "output_proj": _linear(sd, f"{p}.attention.output"),
            },
            "feedforward": {
                "hidden_0": _linear(sd, f"{p}.feedforward.model.0"),
                "out": _linear(sd, f"{p}.feedforward.model.2"),
            },
            "attention_layernorm": _fp32_layernorm(sd, f"{p}.attention_layernorm"),
            "feedforward_layernorm": _fp32_layernorm(sd, f"{p}.feedforward_layernorm"),
        }
    return out


def _flava_tower(sd: Mapping, prefix: str, n_layers: int, kind: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "encoder": _flava_encoder_layers(sd, f"{prefix}.encoder", n_layers),
        "layernorm": _fp32_layernorm(sd, f"{prefix}.layernorm"),
        "pooler": {"dense": _linear(sd, f"{prefix}.pooler.dense")},
    }
    if kind == "image":
        out["embeddings"] = {
            "cls_token": _t2j(sd[f"{prefix}.embeddings.cls_token"]),
            "position_embeddings": _t2j(sd[f"{prefix}.embeddings.position_embeddings"]),
            "patch_projection": _conv2d_nchw(
                sd, f"{prefix}.embeddings.patch_embeddings.projection"
            ),
        }
        if f"{prefix}.embeddings.mask_token" in sd:
            out["embeddings"]["mask_token"] = _t2j(sd[f"{prefix}.embeddings.mask_token"])
    elif kind == "text":
        out["embeddings"] = {
            "word_embeddings": _embedding(sd, f"{prefix}.embeddings.word_embeddings"),
            "position_embeddings": _embedding(sd, f"{prefix}.embeddings.position_embeddings"),
            "token_type_embeddings": _embedding(sd, f"{prefix}.embeddings.token_type_embeddings"),
            "layer_norm": _fp32_layernorm(sd, f"{prefix}.embeddings.layer_norm"),
        }
    elif kind == "mm":
        out["cls_token"] = _t2j(sd[f"{prefix}.cls_token"])
    return out


def flava_params_from_torch(
    state_dict: Mapping,
    image_layers: int = 12,
    text_layers: int = 12,
    mm_layers: int = 6,
) -> Dict[str, Any]:
    """Reference FLAVAModel state dict -> Flax params
    (models/flava/model.py:106 naming)."""
    sd = state_dict
    return {
        "params": {
            "image_encoder": _flava_tower(sd, "image_encoder", image_layers, "image"),
            "text_encoder": _flava_tower(sd, "text_encoder", text_layers, "text"),
            "mm_encoder": _flava_tower(sd, "mm_encoder", mm_layers, "mm"),
            "image_to_mm_projection": _linear(sd, "image_to_mm_projection"),
            "text_to_mm_projection": _linear(sd, "text_to_mm_projection"),
            "text_projection": _linear(sd, "text_projection"),
            "image_projection": _linear(sd, "image_projection"),
        }
    }


def load_torch_checkpoint(path: str) -> Mapping:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, Mapping) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return ckpt
