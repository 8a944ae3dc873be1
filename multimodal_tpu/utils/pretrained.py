"""Pretrained-checkpoint loading: URL maps + torch-state-dict -> Flax params.

Analog of the reference's ``load_module_from_url``
(``utils/common.py:99-107``) and per-model checkpoint maps
(``models/clip/model.py:24-33``, ``models/flava/model.py:62-70``,
``models/masked_auto_encoder/model.py:27-31``). Instead of mutating a live
module, loading returns a Flax param pytree:

    model = clip_vit_b32(pretrained=True)          # needs cached ckpt
    model, params = clip_vit_b32(pretrained="/path/to/clip_vit_b32.pt")

URLs resolve through ``_PATH_MANAGER``'s local cache (zero-egress safe:
pre-populate ``~/.cache/multimodal_tpu`` out-of-band, or use
``_PATH_MANAGER.add_to_cache``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

from multimodal_tpu.utils.file_io import _PATH_MANAGER

# Mirrors the reference CLIP_MODEL_MAPPING (models/clip/model.py:24-33).
CLIP_MODEL_MAPPING = {
    "vit_b16": "https://download.pytorch.org/models/multimodal/clip/clip_vit_b16.pt",
    "vit_b32": "https://download.pytorch.org/models/multimodal/clip/clip_vit_b32.pt",
    "vit_l14": "https://download.pytorch.org/models/multimodal/clip/clip_vit_l14.pt",
    "rn50": "https://download.pytorch.org/models/multimodal/clip/clip_rn50.pt",
    "rn101": "https://download.pytorch.org/models/multimodal/clip/clip_rn101.pt",
    "rn50x4": "https://download.pytorch.org/models/multimodal/clip/clip_rn50x4.pt",
    "rn50x16": "https://download.pytorch.org/models/multimodal/clip/clip_rn50x16.pt",
    "rn50x64": "https://download.pytorch.org/models/multimodal/clip/clip_rn50x64.pt",
}

# Mirrors FLAVA_MODEL_MAPPING / FLAVA_FOR_PRETRAINED_MAPPING
# (models/flava/model.py:60-70).
FLAVA_MODEL_MAPPING = {
    "flava_full": "https://download.pytorch.org/models/multimodal/flava/flava_model_unified_text_encoder.pt",
}
FLAVA_FOR_PRETRAINED_MAPPING = {
    "flava_full": "https://download.pytorch.org/models/multimodal/flava/flava_for_pretraining_unified_text_encoder.pt",
}

# Mirrors MAE_MODEL_MAPPING (models/masked_auto_encoder/model.py:27-31).
MAE_MODEL_MAPPING = {
    "vit_b16_image": "https://download.pytorch.org/models/multimodal/mae/mae_pretrained_vit_base.pth",
    "vit_l16_image": "https://download.pytorch.org/models/multimodal/mae/mae_pretrained_vit_large.pth",
    "vit_b16_audio": "https://download.pytorch.org/models/multimodal/audio_mae/audio_mae_pretrained_vit_base.pth",
}

# Mirrors the omnivore checkpoint table (models/omnivore.py:19-27).
OMNIVORE_MODEL_MAPPING = {
    "swin_t_encoder": "https://download.pytorch.org/models/omnivore_swin_t_encoder-b7e39400.pth",
    "swin_s_encoder": "https://download.pytorch.org/models/omnivore_swin_s_encoder-40b05ba1.pth",
    "swin_b_encoder": "https://download.pytorch.org/models/omnivore_swin_b_encoder-a9134768.pth",
    "swin_t_heads": "https://download.pytorch.org/models/omnivore_swin_t_heads-c8bfb7fd.pth",
    "swin_s_heads": "https://download.pytorch.org/models/omnivore_swin_s_heads-c5e77246.pth",
}

# Mirrors the MUGEN pretrained keys (examples/mugen/generation/text_video_gpt.py:27-35).
MUGEN_MODEL_MAPPING = {
    "mugen_L32": "https://pytorch.s3.amazonaws.com/models/multimodal/mugen/text_video_gpt_L32_weights-17db9549.pth",
    "mugen_L16": "https://pytorch.s3.amazonaws.com/models/multimodal/mugen/text_video_gpt_L16_weights-5dfc5a0a.pth",
    "mugen_L8": "https://pytorch.s3.amazonaws.com/models/multimodal/mugen/text_video_gpt_L8_weights-72b6d2ab.pth",
    "tokenizer_encoder": "https://pytorch.s3.amazonaws.com/models/multimodal/mugen/tokenizer-coinrun_1024_encoder.json",
    "tokenizer_merges": "https://pytorch.s3.amazonaws.com/models/multimodal/mugen/tokenizer-coinrun_1024_merges.txt",
}


def load_torch_state_dict(path_or_url: str) -> Mapping[str, Any]:
    """Resolve a path/URL via the cache and load a torch state dict on CPU.

    Unwraps the common ``{"state_dict": ...}`` / ``{"model": ...}`` container
    formats and strips DDP ``module.`` prefixes.
    """
    import torch

    local = _PATH_MANAGER.get_local_path(path_or_url)
    ckpt = torch.load(local, map_location="cpu", weights_only=True)
    if isinstance(ckpt, Mapping):
        for key in ("state_dict", "model"):
            if key in ckpt and isinstance(ckpt[key], Mapping):
                ckpt = ckpt[key]
                break
    if any(k.startswith("module.") for k in ckpt):
        ckpt = {k[len("module."):] if k.startswith("module.") else k: v for k, v in ckpt.items()}
    return ckpt


def load_pretrained_params(
    checkpoint: str,
    converter: Callable[..., Dict[str, Any]],
    **converter_kwargs: Any,
) -> Dict[str, Any]:
    """Load a torch checkpoint (path or URL) and convert to Flax params."""
    sd = load_torch_state_dict(checkpoint)
    return converter(sd, **converter_kwargs)


def resolve_checkpoint(pretrained: Any, mapping: Mapping[str, str], default_key: str) -> str:
    """Turn a builder's ``pretrained`` argument into a checkpoint location.

    ``True`` -> the default URL from ``mapping``; a key of ``mapping`` -> that
    URL; any other string -> treated as a local path or URL directly.
    """
    if pretrained is True:
        return mapping[default_key]
    if isinstance(pretrained, str) and pretrained in mapping:
        return mapping[pretrained]
    if isinstance(pretrained, str):
        return pretrained
    raise ValueError(f"unsupported pretrained={pretrained!r}")


# Mirrors FLAVA's frozen dVAE codebook source (models/flava/model.py:726-733:
# torch.hub.load_state_dict_from_url on OpenAI's encoder.pkl).
DALLE_MODEL_MAPPING = {
    "dvae_encoder": "https://cdn.openai.com/dall-e/encoder.pkl",
}


def load_dalle_encoder_params(pretrained: Any = True, **converter_kwargs: Any) -> Dict[str, Any]:
    """Load the DALL-E dVAE encoder weights and convert to Flax params for
    :class:`~multimodal_tpu.models.flava.dalle_vae.DalleVAEEncoder`.

    Accepts ``True`` (OpenAI URL through the cache), a mapping key, a local
    path to ``encoder.pkl``, or a path to a plain ``.pt`` state dict. The
    OpenAI pickle stores a full module object; loading it needs no DALL-E
    package — we only read its ``state_dict()``."""
    import torch

    from multimodal_tpu.utils.checkpoint import dalle_encoder_params_from_torch

    ckpt = resolve_checkpoint(pretrained, DALLE_MODEL_MAPPING, "dvae_encoder")
    local = _PATH_MANAGER.get_local_path(ckpt)
    try:
        obj = torch.load(local, map_location="cpu", weights_only=True)
    except Exception:
        # encoder.pkl is a pickled module, not a raw state dict
        obj = torch.load(local, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return dalle_encoder_params_from_torch(sd, **converter_kwargs)
