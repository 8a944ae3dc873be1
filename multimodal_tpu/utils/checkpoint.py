"""PyTorch-checkpoint → Flax-params converters.

Replaces the reference's URL-based pretrained loading
(``utils/common.py:99-107`` load_module_from_url + per-model checkpoint
maps, e.g. ``models/clip/model.py:24-33``): here checkpoints are converted
once into Flax param pytrees (then saved/restored with orbax — see
``multimodal_tpu.training.checkpoint``).

torch is an optional dependency: only needed when actually converting.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

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


def _qkv_attention(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """MultiHeadAttentionWithCache-style separate q/k/v/output projections."""
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "output_proj": _linear(sd, f"{prefix}.output_proj"),
    }


def _coca_encoder_layers(sd: Mapping, prefix: str, n_layers: int) -> Dict[str, Any]:
    """Reference shared TransformerEncoder (fused input_proj) -> ours."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"{prefix}.layer.{i}"
        out[f"layer_{i}"] = {
            "attention": {
                "input_proj": _linear(sd, f"{p}.attention.input_proj"),
                "output_proj": _linear(sd, f"{p}.attention.output_proj"),
            },
            "feedforward": {
                "hidden_0": _linear(sd, f"{p}.feedforward.model.0"),
                "out": _linear(sd, f"{p}.feedforward.model.2"),
            },
            "attention_layernorm": _fp32_layernorm(sd, f"{p}.attention_layernorm"),
            "feedforward_layernorm": _fp32_layernorm(sd, f"{p}.feedforward_layernorm"),
        }
    return out


def _coca_decoder_layers(
    sd: Mapping, prefix: str, n_layers: int, cross_attention: bool
) -> Dict[str, Any]:
    """Reference shared TransformerDecoder (separate q/k/v projections)."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"{prefix}.layer.{i}"
        layer: Dict[str, Any] = {
            "attention": _qkv_attention(sd, f"{p}.attention"),
            "feedforward": {
                "hidden_0": _linear(sd, f"{p}.feedforward.model.0"),
                "out": _linear(sd, f"{p}.feedforward.model.2"),
            },
            "attention_layernorm": _fp32_layernorm(sd, f"{p}.attention_layernorm"),
            "feedforward_layernorm": _fp32_layernorm(sd, f"{p}.feedforward_layernorm"),
        }
        if cross_attention and f"{p}.cross_attention.q_proj.weight" in sd:
            layer["cross_attention"] = _qkv_attention(sd, f"{p}.cross_attention")
            layer["cross_attention_layernorm"] = _fp32_layernorm(
                sd, f"{p}.cross_attention_layernorm"
            )
        out[f"layer_{i}"] = layer
    return out


def _attention_pooler(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "query": _t2j(sd[f"{prefix}.query"]),
        "attn": _qkv_attention(sd, f"{prefix}.attn"),
        "ln_q": _layernorm(sd, f"{prefix}.ln_q"),
        "ln_k": _layernorm(sd, f"{prefix}.ln_k"),
        "ln_post": _layernorm(sd, f"{prefix}.ln_post"),
    }


def coca_params_from_torch(
    state_dict: Mapping,
    vision_layers: int = 12,
    text_layers: int = 12,
    fusion_layers: int = 12,
    num_poolers: int = 2,
) -> Dict[str, Any]:
    """Reference CoCa state dict -> Flax params.

    Maps ``models/coca/coca_model.py:34`` (CoCaModel: vision_encoder /
    text_decoder / multimodal_decoder / vision_pooler / vision_proj) onto
    this framework's ``models/coca/coca_model.py`` module tree.
    ``num_poolers=2`` for the cascaded pooler, 1 for parallel.
    """
    sd = state_dict
    vision = _vit_tower(sd, "vision_encoder", vision_layers)

    text: Dict[str, Any] = {
        "embeddings": {
            "token_embeddings": _embedding(sd, "text_decoder.embeddings.token_embeddings"),
            "position_embeddings": _t2j(sd["text_decoder.embeddings.position_embeddings"]),
        },
        "transformer_decoder": _coca_decoder_layers(
            sd, "text_decoder.transformer_decoder", text_layers, cross_attention=False
        ),
        "ln_final": _layernorm(sd, "text_decoder.ln_final"),
        "text_projection": _linear(sd, "text_decoder.text_projection", bias=False),
    }
    if "text_decoder.embeddings.cls_embedding" in sd:
        text["embeddings"]["cls_embedding"] = _t2j(sd["text_decoder.embeddings.cls_embedding"])

    mm_decoder = _coca_decoder_layers(
        sd, "multimodal_decoder.transformer_decoder", fusion_layers, cross_attention=True
    )
    if "multimodal_decoder.transformer_decoder.final_layer_norm.weight" in sd:
        mm_decoder["final_layer_norm"] = _fp32_layernorm(
            sd, "multimodal_decoder.transformer_decoder.final_layer_norm"
        )
    multimodal: Dict[str, Any] = {"transformer_decoder": mm_decoder}
    if "multimodal_decoder.output_projection.weight" in sd:
        multimodal["output_projection"] = _linear(
            sd, "multimodal_decoder.output_projection", bias=False
        )

    if num_poolers > 1:
        pooler = {
            f"poolers_{i}": _attention_pooler(sd, f"vision_pooler.poolers.{i}")
            for i in range(num_poolers)
        }
    else:
        pooler = _attention_pooler(sd, "vision_pooler")

    return {
        "params": {
            "vision_encoder": vision,
            "text_decoder": text,
            "multimodal_decoder": multimodal,
            "vision_pooler": pooler,
            "vision_proj": {"kernel": _t2j(sd["vision_proj.weight"]).T},
        }
    }


def _vit_tower(sd: Mapping, prefix: str, n_layers: int) -> Dict[str, Any]:
    """Reference shared VisionTransformer tower -> ours (fused input_proj)."""
    out: Dict[str, Any] = {
        "embeddings": {
            "position_embeddings": _t2j(sd[f"{prefix}.embeddings.position_embeddings"]),
            "conv_projection": _conv2d_nchw(sd, f"{prefix}.embeddings.conv_projection"),
        },
        "encoder": _coca_encoder_layers(sd, f"{prefix}.encoder", n_layers),
    }
    if f"{prefix}.embeddings.cls_token" in sd:
        out["embeddings"]["cls_token"] = _t2j(sd[f"{prefix}.embeddings.cls_token"])
    if f"{prefix}.encoder.final_layer_norm.weight" in sd:
        out["encoder"]["final_layer_norm"] = _fp32_layernorm(
            sd, f"{prefix}.encoder.final_layer_norm"
        )
    return out


def _qformer_layers(sd: Mapping, prefix: str, n_layers: int) -> Dict[str, Any]:
    """Reference QformerEncoder layers (models/blip2/qformer_layers.py:19)."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        layer: Dict[str, Any] = {
            "self_attention": _qkv_attention(sd, f"{p}.self_attention"),
            "self_attn_layernorm": _fp32_layernorm(sd, f"{p}.self_attn_layernorm"),
            "feedforward": {
                "hidden_0": _linear(sd, f"{p}.feedforward.model.0"),
                "out": _linear(sd, f"{p}.feedforward.model.2"),
            },
            "feedforward_layernorm": _fp32_layernorm(sd, f"{p}.feedforward_layernorm"),
            "feedforward_query": {
                "hidden_0": _linear(sd, f"{p}.feedforward_query.model.0"),
                "out": _linear(sd, f"{p}.feedforward_query.model.2"),
            },
            "feedforward_layernorm_query": _fp32_layernorm(
                sd, f"{p}.feedforward_layernorm_query"
            ),
        }
        if f"{p}.cross_attention.q_proj.weight" in sd:
            layer["cross_attention"] = _qkv_attention(sd, f"{p}.cross_attention")
            layer["cross_attn_layernorm"] = _fp32_layernorm(sd, f"{p}.cross_attn_layernorm")
        out[f"layer_{i}"] = layer
    return out


def blip2_params_from_torch(
    state_dict: Mapping,
    vision_layers: int = 39,
    qformer_layers: int = 12,
) -> Dict[str, Any]:
    """Reference BLIP2 state dict -> Flax params (models/blip2/blip2.py:38)."""
    sd = state_dict
    return {
        "params": {
            "query_tokens": _t2j(sd["query_tokens"]),
            "vision_encoder": _vit_tower(sd, "vision_encoder", vision_layers),
            "qformer": {
                "head": {
                    "linear_1": _linear(sd, "qformer.head.linear_1"),
                    "layernorm": _layernorm(sd, "qformer.head.layernorm"),
                    "linear_2": _linear(sd, "qformer.head.linear_2"),
                },
                "model": {
                    "embeddings": {
                        "token_embeddings": _embedding(sd, "qformer.model.embeddings.token_embeddings"),
                        "position_embeddings": _embedding(sd, "qformer.model.embeddings.position_embeddings"),
                        "layernorm": _fp32_layernorm(sd, "qformer.model.embeddings.layernorm"),
                    },
                    "encoder": _qformer_layers(sd, "qformer.model.encoder", qformer_layers),
                },
            },
            "vision_proj": _linear(sd, "vision_proj"),
            "text_proj": _linear(sd, "text_proj"),
            "ln_vision": _layernorm(sd, "ln_vision"),
        }
    }


def mae_params_from_torch(
    state_dict: Mapping,
    encoder_layers: int = 12,
    decoder_layers: int = 8,
) -> Dict[str, Any]:
    """Reference MaskedAutoEncoder state dict -> Flax params
    (models/masked_auto_encoder/model.py:41 naming; ViT decoder only)."""
    sd = state_dict
    encoder = _coca_encoder_layers(sd, "encoder", encoder_layers)
    encoder["final_layer_norm"] = _fp32_layernorm(sd, "encoder.final_layer_norm")
    decoder = _coca_encoder_layers(sd, "decoder_transformer", decoder_layers)
    decoder["final_layer_norm"] = _fp32_layernorm(sd, "decoder_transformer.final_layer_norm")
    return {
        "params": {
            "embeddings": {
                "cls_token": _t2j(sd["embeddings.cls_token"]),
                "position_embeddings": _t2j(sd["embeddings.position_embeddings"]),
                "conv_projection": _conv2d_nchw(sd, "embeddings.conv_projection"),
            },
            "encoder_transformer": encoder,
            "decoder_embed": {
                "mask_token": _t2j(sd["decoder_embed.mask_token"]),
                "position_embeddings": _t2j(sd["decoder_embed.position_embeddings"]),
                "decoder_embed": _linear(sd, "decoder_embed.decoder_embed"),
            },
            "decoder_transformer": decoder,
            "decoder_pred": _linear(sd, "decoder_pred"),
        }
    }


def _conv3d_ncdhw(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    # torch (out, in, kt, kh, kw) -> flax (kt, kh, kw, in, out)
    out = {"kernel": _t2j(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t2j(sd[f"{prefix}.bias"])
    return out


def _convt3d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    # torch ConvTranspose3d (in, out, k...) convolves with a FLIPPED kernel
    # relative to flax nn.ConvTranspose (fractionally-strided plain conv)
    w = _t2j(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 0, 1)
    out = {"kernel": np.flip(w, axis=(0, 1, 2)).copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t2j(sd[f"{prefix}.bias"])
    return out


def _batchnorm(sd: Mapping, prefix: str):
    params = {"scale": _t2j(sd[f"{prefix}.weight"]), "bias": _t2j(sd[f"{prefix}.bias"])}
    stats = {"mean": _t2j(sd[f"{prefix}.running_mean"]), "var": _t2j(sd[f"{prefix}.running_var"])}
    return params, stats


def _attention_residual_block(sd: Mapping, prefix: str, n_axes: int = 3):
    """Reference AttentionResidualBlock (models/video_gpt/video_vqvae.py:406):
    Sequential(BN, ReLU, conv3x3, BN, ReLU, conv1x1, BN, ReLU, AxialAttention)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for bn_name, idx in (("bn_1", 0), ("bn_2", 3), ("bn_3", 6)):
        p, s = _batchnorm(sd, f"{prefix}.block.{idx}")
        params[bn_name] = p
        stats[bn_name] = s
    params["conv_1"] = {"conv": _conv3d_ncdhw(sd, f"{prefix}.block.2.conv")}
    params["conv_2"] = {"conv": _conv3d_ncdhw(sd, f"{prefix}.block.5.conv")}
    attn = {}
    for i in range(n_axes):
        a = f"{prefix}.block.8.mha_attns.{i}"
        attn[f"mha_attn_{i}"] = {
            "query": _linear(sd, f"{a}.query", bias=False),
            "key": _linear(sd, f"{a}.key", bias=False),
            "value": _linear(sd, f"{a}.value", bias=False),
            "output": _linear(sd, f"{a}.output"),
        }
    params["attn_block"] = attn
    return params, stats


def video_vqvae_params_from_torch(state_dict: Mapping, prefix: str = "") -> Dict[str, Any]:
    """Reference video_vqvae state dict -> Flax variables
    (models/video_gpt/video_vqvae.py:141; layer counts inferred from keys).

    Returns the full variable dict: ``params`` + ``batch_stats`` (BN running
    stats) + ``vq_stats`` (codebook buffers, marked initialized)."""
    sd = state_dict
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    stats: Dict[str, Any] = {"encoder": {}, "decoder": {}}

    enc_convs = sorted({int(k.split(".")[2]) for k in sd if k.startswith("encoder.convs.")})
    for out_i, torch_i in enumerate(enc_convs):
        params["encoder"][f"conv_{out_i}"] = {
            "conv": _conv3d_ncdhw(sd, f"encoder.convs.{torch_i}.conv")
        }
    n_res = len({k.split(".")[2] for k in sd
                 if k.startswith("encoder.res_stack.") and ".block." in k})
    for tower in ("encoder", "decoder"):
        for i in range(n_res):
            p, s = _attention_residual_block(sd, f"{tower}.res_stack.{i}")
            params[tower][f"res_{i}"] = p
            stats[tower][f"res_{i}"] = s
        p, s = _batchnorm(sd, f"{tower}.res_stack.{n_res}")
        params[tower]["bn_out"] = p
        stats[tower]["bn_out"] = s
    params["encoder"]["conv_out"] = {"conv": _conv3d_ncdhw(sd, "encoder.conv_out.conv")}
    params["decoder"]["conv_in"] = {"conv": _conv3d_ncdhw(sd, "decoder.conv_in.conv")}
    dec_convts = sorted({int(k.split(".")[2]) for k in sd if k.startswith("decoder.convts.")})
    for out_i, torch_i in enumerate(dec_convts):
        params["decoder"][f"convt_{out_i}"] = {
            "convt": _convt3d(sd, f"decoder.convts.{torch_i}.convt")
        }

    embedding = _t2j(sd["codebook.embedding"])
    return {
        "params": params,
        "batch_stats": stats,
        "vq_stats": {
            "codebook": {
                "embedding": embedding,
                "code_avg": _t2j(sd["codebook.code_avg"]),
                "code_usage": _t2j(sd["codebook.code_usage"]),
                "is_init": np.ones((), np.bool_),
            }
        },
    }


def _torch_mha_to_qkv(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """torch nn.MultiheadAttention fused in_proj -> separate q/k/v + output."""
    w = _t2j(sd[f"{prefix}.in_proj_weight"])  # (3E, E)
    b = _t2j(sd[f"{prefix}.in_proj_bias"])
    e = w.shape[1]
    return {
        "q_proj": {"kernel": w[:e].T, "bias": b[:e]},
        "k_proj": {"kernel": w[e:2 * e].T, "bias": b[e:2 * e]},
        "v_proj": {"kernel": w[2 * e:].T, "bias": b[2 * e:]},
        "output_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def mdetr_transformer_params_from_torch(
    state_dict: Mapping,
    num_encoder_layers: int = 6,
    num_decoder_layers: int = 6,
) -> Dict[str, Any]:
    """Reference MDETRTransformer state dict -> Flax params
    (models/mdetr/transformer.py:20 naming)."""
    sd = state_dict
    params: Dict[str, Any] = {}
    for i in range(num_encoder_layers):
        p = f"encoder.layers.{i}"
        params[f"encoder_{i}"] = {
            "self_attn": _torch_mha_to_qkv(sd, f"{p}.self_attn"),
            "mlp": {
                "hidden_0": _linear(sd, f"{p}.mlp.model.0"),
                "out": _linear(sd, f"{p}.mlp.model.2"),
            },
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    for i in range(num_decoder_layers):
        p = f"decoder.layers.{i}"
        params[f"decoder_{i}"] = {
            "self_attn": _torch_mha_to_qkv(sd, f"{p}.self_attn"),
            "cross_attn_image": _torch_mha_to_qkv(sd, f"{p}.cross_attn_image"),
            "mlp": {
                "hidden_0": _linear(sd, f"{p}.mlp.model.0"),
                "out": _linear(sd, f"{p}.mlp.model.2"),
            },
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
            "norm4": _layernorm(sd, f"{p}.norm4"),
        }
    params["decoder_norm"] = _layernorm(sd, "decoder.norm")
    return {"params": params}


def video_gpt_params_from_torch(
    state_dict: Mapping,
    num_decoder_layers: int = 16,
    n_latent_dims: int = 3,
) -> Dict[str, Any]:
    """Reference MultimodalGPT state dict -> Flax variables
    (models/video_gpt/gpt.py:66 naming, incl. both VQVAE tokenizers)."""
    sd = state_dict

    def pos_emb(prefix: str) -> Dict[str, np.ndarray]:
        return {f"d_{i}": _t2j(sd[f"{prefix}.embedding.d_{i}"])
                for i in range(n_latent_dims)}

    decoder: Dict[str, Any] = {}
    for i in range(num_decoder_layers):
        p = f"mm_decoder.decoder.layers.{i}"
        decoder[f"layer_{i}"] = {
            "attention": {
                "query": _linear(sd, f"{p}.attention.query", bias=False),
                "key": _linear(sd, f"{p}.attention.key", bias=False),
                "value": _linear(sd, f"{p}.attention.value", bias=False),
                "output": _linear(sd, f"{p}.attention.output"),
            },
            "mlp": {
                "hidden_0": _linear(sd, f"{p}.mlp.model.0"),
                "out": _linear(sd, f"{p}.mlp.model.2"),
            },
            "norm_attn": _layernorm(sd, f"{p}.norm_attn"),
            "norm_mlp": _layernorm(sd, f"{p}.norm_mlp"),
        }

    in_tok = video_vqvae_params_from_torch(state_dict, prefix="in_tokenizer.")
    out_tok = video_vqvae_params_from_torch(state_dict, prefix="out_tokenizer.")
    params = {
        "mm_decoder": {
            "in_pos_emb": pos_emb("mm_decoder.in_pos_emb"),
            "out_pos_emb": pos_emb("mm_decoder.out_pos_emb"),
            "decoder": decoder,
            "right_shift": {"sos": _t2j(sd["mm_decoder.right_shift.sos"])},
        },
        "in_projection": _linear(sd, "in_projection", bias=False),
        "out_projection": _linear(sd, "out_projection", bias=False),
        "norm": _layernorm(sd, "norm"),
        "to_logit": _linear(sd, "to_logit", bias=False),
        "in_tokenizer": in_tok["params"],
        "out_tokenizer": out_tok["params"],
    }
    return {
        "params": params,
        "batch_stats": {
            "in_tokenizer": in_tok["batch_stats"],
            "out_tokenizer": out_tok["batch_stats"],
        },
        "vq_stats": {
            "in_tokenizer": in_tok["vq_stats"],
            "out_tokenizer": out_tok["vq_stats"],
        },
    }


def swin_decoder_params_from_torch(
    state_dict: Mapping, n_layer: int = 16
) -> Dict[str, Any]:
    """Reference AudioMAE SwinTransformer decoder state dict -> Flax params
    (models/masked_auto_encoder/swin_decoder.py:350 naming)."""
    sd = state_dict
    params: Dict[str, Any] = {}
    for i in range(n_layer):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                "tau": _t2j(sd[f"{p}.attn.tau"]),
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "proj": _linear(sd, f"{p}.attn.proj"),
                "meta_mlp": {
                    "hidden_0": _linear(sd, f"{p}.attn.meta_mlp.model.0"),
                    "out": _linear(sd, f"{p}.attn.meta_mlp.model.3"),
                },
            },
            "mlp": {
                "hidden_0": _linear(sd, f"{p}.mlp.model.0"),
                "out": _linear(sd, f"{p}.mlp.model.2"),
            },
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    params["final_layer_norm"] = _layernorm(sd, "final_layer_norm")
    return {"params": params}


def clip_resnet_params_from_torch(
    state_dict: Mapping, layers: Sequence[int] = (3, 4, 6, 3)
) -> Dict[str, Any]:
    """Reference ResNetForCLIP state dict -> Flax variables
    (models/clip/image_encoder.py:116 naming). Returns params + batch_stats."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(name, prefix):
        p, s = _batchnorm(sd, prefix)
        params_dst[name] = p
        stats_dst[name] = s

    params_dst, stats_dst = params, stats
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv2d_nchw(sd, f"conv{i}", bias=False)
        bn(f"bn{i}", f"bn{i}")

    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            p = f"layer{li}.{bi}"
            block_p: Dict[str, Any] = {}
            block_s: Dict[str, Any] = {}
            params_dst, stats_dst = block_p, block_s
            for i in (1, 2, 3):
                block_p[f"conv{i}"] = _conv2d_nchw(sd, f"{p}.conv{i}", bias=False)
                bn(f"bn{i}", f"{p}.bn{i}")
            if f"{p}.downsample.0.weight" in sd:
                block_p["downsample_conv"] = _conv2d_nchw(sd, f"{p}.downsample.0", bias=False)
                bn("downsample_bn", f"{p}.downsample.1")
            params[f"layer{li}_{bi}"] = block_p
            stats[f"layer{li}_{bi}"] = block_s
    params_dst, stats_dst = params, stats

    params["attnpool"] = {
        "positional_embedding": _t2j(sd["attnpool.positional_embedding"]),
        "q_proj": _linear(sd, "attnpool.q_proj"),
        "k_proj": _linear(sd, "attnpool.k_proj"),
        "v_proj": _linear(sd, "attnpool.v_proj"),
        "c_proj": _linear(sd, "attnpool.c_proj"),
    }
    return {"params": params, "batch_stats": stats}


def _dalle_conv(sd: Mapping, prefix: str) -> Dict[str, Any]:
    # DALL-E Conv2d stores weights as .w/.b (models/flava/model.py:592-622)
    return {"conv": {"kernel": _t2j(sd[f"{prefix}.w"]).transpose(2, 3, 1, 0),
                     "bias": _t2j(sd[f"{prefix}.b"])}}


def dalle_encoder_params_from_torch(
    state_dict: Mapping, group_count: int = 4, n_blk_per_group: int = 2
) -> Dict[str, Any]:
    """Reference DalleEncoder (FLAVA's frozen dVAE codebook,
    models/flava/model.py:624) state dict -> Flax params. Use on the weights
    inside ``DalleVAEEncoder`` (openai ``encoder.pkl``) for MIM labels."""
    sd = state_dict
    params: Dict[str, Any] = {
        "input_conv": _dalle_conv(sd, "blocks.input"),
        "output_conv": _dalle_conv(sd, "blocks.output.conv"),
    }
    for g in range(1, 5):
        for b in range(1, n_blk_per_group + 1):
            p = f"blocks.group_{g}.block_{b}"
            block: Dict[str, Any] = {
                f"conv_{i}": _dalle_conv(sd, f"{p}.res_path.conv_{i}")
                for i in range(1, 5)
            }
            if f"{p}.id_path.w" in sd:
                block["id_path"] = _dalle_conv(sd, f"{p}.id_path")
            params[f"group_{g}_block_{b}"] = block
    return {"params": params}


def attention_fusion_params_from_torch(state_dict: Mapping) -> Dict[str, Any]:
    """Reference AttentionFusionModule (modules/fusions/attention_fusion.py:13)."""
    sd = state_dict
    params: Dict[str, Any] = {"attention": _linear(sd, "attention.0")}
    for key in sorted({k.split(".")[1] for k in sd if k.startswith("encoding_projection.")}):
        params[f"projection_{key}"] = _linear(sd, f"encoding_projection.{key}")
    return {"params": params}


def deepset_fusion_params_from_torch(state_dict: Mapping) -> Dict[str, Any]:
    """Reference DeepsetFusionModule (modules/fusions/deepset_fusion.py:14).
    Reference torch MLP hides dropout at index 1-2, so the second linear is
    ``model.3`` when dropout is configured and ``model.2`` otherwise."""
    sd = state_dict
    second = "mlp.model.3" if "mlp.model.3.weight" in sd else "mlp.model.2"
    params: Dict[str, Any] = {
        "mlp": {
            "hidden_0": _linear(sd, "mlp.model.0"),
            "out": _linear(sd, second),
        }
    }
    if "attention.0.weight" in sd:
        params["attention"] = _linear(sd, "attention.0")
    for key in sorted({k.split(".")[1] for k in sd if k.startswith("projections.")}):
        params[f"projection_{key}"] = _linear(sd, f"projections.{key}")
    return {"params": params}


# ---------------------------------------------------------------------------
# ADM U-Net (diffusion_labs)

def _groupnorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t2j(sd[f"{prefix}.weight"]), "bias": _t2j(sd[f"{prefix}.bias"])}


def _adm_res_block(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Reference ADMResBlock (res_block.py:40) -> ADMResBlock params."""
    out = {
        "norm1": _groupnorm(sd, f"{prefix}.in_block.0"),
        "conv1": _conv2d_nchw(sd, f"{prefix}.in_block.3"),
        "cond_proj": _linear(sd, f"{prefix}.cond_proj.1"),
        "norm2": _groupnorm(sd, f"{prefix}.out_group_norm"),
        "conv2": _conv2d_nchw(sd, f"{prefix}.out_block.2"),
    }
    if f"{prefix}.skip_block.1.weight" in sd:
        out["skip"] = _conv2d_nchw(sd, f"{prefix}.skip_block.1")
    return out


def _adm_attn_block(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Reference ADMAttentionBlock + ADMCrossAttention (attention_block.py)."""
    out = {
        "norm": _groupnorm(sd, f"{prefix}.norm"),
        "q": _linear(sd, f"{prefix}.attn.query"),
        "k": _linear(sd, f"{prefix}.attn.key"),
        "v": _linear(sd, f"{prefix}.attn.value"),
        "proj": _linear(sd, f"{prefix}.attn.output"),
    }
    if f"{prefix}.attn.attn.cond_proj.weight" in sd:
        out["cond_proj"] = _linear(sd, f"{prefix}.attn.attn.cond_proj")
    return out


def adm_unet_params_from_torch(torch_model) -> Dict[str, Any]:
    """Convert a reference ``ADMUNet`` (adm.py:27) to ADMUNet params.

    Walks the same construction order as both implementations: down stacks
    (res[+attn] x num_res, then a downsample res), bottleneck (res/attn/res),
    up stacks (res[+attn], upsample res riding in each layer's last stack).
    """
    sd = {k: v for k, v in torch_model.state_dict().items()}
    L = list(torch_model.channels_per_layer)
    num_resize = torch_model.num_resize
    num_res = torch_model.num_res_per_layer
    use_attn = list(torch_model.use_attention_for_layer)

    params: Dict[str, Any] = {
        "time_dense1": _linear(sd, "timestep_encoder.1"),
        "time_dense2": _linear(sd, "timestep_encoder.3"),
        "conv_in": _conv2d_nchw(sd, "down.0._module_list.0"),
    }
    if torch_model.res_cond_proj is not None:
        for key in torch_model.res_cond_proj:
            params[f"res_cond_{key}"] = _linear(sd, f"res_cond_proj.{key}")
    if torch_model.attn_cond_proj is not None:
        for key in torch_model.attn_cond_proj:
            params[f"attn_cond_{key}"] = _linear(sd, f"attn_cond_proj.{key}.0")

    di = 1  # down.0 is the input conv stack
    for li in range(len(L)):
        for bi in range(num_res):
            stack = {"res_0": _adm_res_block(sd, f"down.{di}._module_list.0")}
            if use_attn[li]:
                stack["attn_1"] = _adm_attn_block(sd, f"down.{di}._module_list.1")
            params[f"down_{li}_{bi}"] = stack
            di += 1
        if li < num_resize:
            params[f"down_resize_{li}"] = {
                "res_0": _adm_res_block(sd, f"down.{di}._module_list.0")
            }
            di += 1

    params["bottleneck"] = {
        "res_0": _adm_res_block(sd, "bottleneck._module_list.0"),
        "attn_1": _adm_attn_block(sd, "bottleneck._module_list.1"),
        "res_2": _adm_res_block(sd, "bottleneck._module_list.2"),
    }

    up_attn = list(reversed(use_attn))
    ui = 0
    for li in range(len(L)):
        for bi in range(num_res + 1):
            stack = {"res_0": _adm_res_block(sd, f"up.{ui}._module_list.0")}
            idx = 1
            if up_attn[li]:
                stack[f"attn_{idx}"] = _adm_attn_block(sd, f"up.{ui}._module_list.{idx}")
                idx += 1
            if bi == num_res and li < num_resize:
                stack[f"res_{idx}"] = _adm_res_block(sd, f"up.{ui}._module_list.{idx}")
            params[f"up_{li}_{bi}"] = stack
            ui += 1

    params["norm_out"] = _groupnorm(sd, f"up.{ui}._module_list.0.0")
    params["conv_out"] = _conv2d_nchw(sd, f"up.{ui}._module_list.0.2")
    return {"params": params}


def _dense_from_conv1x1(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    # torch 1x1 Conv2d (out, in, 1, 1) -> flax Dense kernel (in, out)
    out = {"kernel": _t2j(sd[f"{prefix}.weight"])[:, :, 0, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t2j(sd[f"{prefix}.bias"])
    return out


def _vae_res_block(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Reference LDM-VAE ResBlock (vae/res_block.py:14, built by
    encoder_decoder.py:291 with scale_shift_conditional=False)."""
    out = {
        "norm1": _groupnorm(sd, f"{prefix}.in_block.0"),
        "conv1": _conv2d_nchw(sd, f"{prefix}.in_block.3"),
        "norm2": _groupnorm(sd, f"{prefix}.out_group_norm"),
        "conv2": _conv2d_nchw(sd, f"{prefix}.out_block.2"),
    }
    if f"{prefix}.skip_block.1.weight" in sd:
        out["skip"] = _conv2d_nchw(sd, f"{prefix}.skip_block.1")
    return out


def _vae_attn_block(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Reference AttentionResBlock(VanillaAttention) (vae/attention.py:15,66):
    1x1-conv q/k/v/out projections -> Dense kernels."""
    return {
        "norm": _groupnorm(sd, f"{prefix}.net.norm"),
        "q": _dense_from_conv1x1(sd, f"{prefix}.net.attn.query"),
        "k": _dense_from_conv1x1(sd, f"{prefix}.net.attn.key"),
        "v": _dense_from_conv1x1(sd, f"{prefix}.net.attn.value"),
        "proj": _dense_from_conv1x1(sd, f"{prefix}.net.out"),
    }


def vae_params_from_torch(
    torch_model,
    num_res_blocks: int,
    channel_multipliers,
) -> Dict[str, Any]:
    """Convert a reference ``ldm_variational_autoencoder`` (vae/vae.py:76)
    to params for :func:`ldm_variational_autoencoder`."""
    sd = {k: v for k, v in torch_model.state_dict().items()}
    n_levels = len(channel_multipliers)

    enc: Dict[str, Any] = {"conv_in": _conv2d_nchw(sd, "encoder.resnet_encoder.init_conv")}
    for li in range(n_levels):
        base = f"encoder.resnet_encoder.down_block.{li}"
        for bi in range(num_res_blocks):
            enc[f"down_{li}_{bi}"] = _vae_res_block(sd, f"{base}.{bi}")
        if li < n_levels - 1:
            enc[f"downsample_{li}"] = _conv2d_nchw(sd, f"{base}.{num_res_blocks}.op.1")
    enc["mid_res1"] = _vae_res_block(sd, "encoder.resnet_encoder.mid_block.0")
    enc["mid_attn"] = _vae_attn_block(sd, "encoder.resnet_encoder.mid_block.1")
    enc["mid_res2"] = _vae_res_block(sd, "encoder.resnet_encoder.mid_block.2")
    enc["norm_out"] = _groupnorm(sd, "encoder.resnet_encoder.out_block.0")
    enc["conv_out"] = _conv2d_nchw(sd, "encoder.resnet_encoder.out_block.2")

    dec: Dict[str, Any] = {"conv_in": _conv2d_nchw(sd, "decoder.resnet_decoder.init_conv")}
    dec["mid_res1"] = _vae_res_block(sd, "decoder.resnet_decoder.mid_block.0")
    dec["mid_attn"] = _vae_attn_block(sd, "decoder.resnet_decoder.mid_block.1")
    dec["mid_res2"] = _vae_res_block(sd, "decoder.resnet_decoder.mid_block.2")
    for li in range(n_levels):
        base = f"decoder.resnet_decoder.up_block.{li}"
        # decoder levels carry num_res_blocks + 1 blocks (encoder_decoder.py:216)
        for bi in range(num_res_blocks + 1):
            dec[f"up_{li}_{bi}"] = _vae_res_block(sd, f"{base}.{bi}")
        if li < n_levels - 1:
            dec[f"upsample_{li}"] = _conv2d_nchw(
                sd, f"{base}.{num_res_blocks + 1}.conv"
            )
    dec["norm_out"] = _groupnorm(sd, "decoder.resnet_decoder.out_nonlinearity_block.0")
    dec["conv_out"] = _conv2d_nchw(sd, "decoder.resnet_decoder.conv_out")

    params = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": {
            "kernel": _t2j(sd["encoder.quant_conv.weight"]).transpose(2, 3, 1, 0),
            "bias": _t2j(sd["encoder.quant_conv.bias"]),
        },
        "post_quant_conv": {
            "kernel": _t2j(sd["decoder.post_quant_conv.weight"]).transpose(2, 3, 1, 0),
            "bias": _t2j(sd["decoder.post_quant_conv.bias"]),
        },
    }
    return {"params": params}


def _mlp_generic(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Reference MLP (mlp.py:13): nn.Sequential ``model`` whose Linear
    member indices depend on dropout/normalization — map the Linears in
    order to hidden_{i}.. / out."""
    import re as _re

    idxs = sorted(
        int(m.group(1))
        for k in sd
        if (m := _re.fullmatch(rf"{_re.escape(prefix)}\.model\.(\d+)\.weight", k))
    )
    out: Dict[str, Any] = {}
    for j, idx in enumerate(idxs):
        name = "out" if j == len(idxs) - 1 else f"hidden_{j}"
        out[name] = _linear(sd, f"{prefix}.model.{idx}")
    return out


def _ndim_mha(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Reference n-dim MultiHeadAttention (attention.py:70): separate
    query/key/value/output Linears -> q/k/v/output_proj."""
    return {
        "q_proj": _linear(sd, f"{prefix}.query"),
        "k_proj": _linear(sd, f"{prefix}.key"),
        "v_proj": _linear(sd, f"{prefix}.value"),
        "output_proj": _linear(sd, f"{prefix}.output"),
    }


def albef_multimodal_encoder_params_from_torch(
    torch_model, n_layers: int
) -> Dict[str, Any]:
    """Convert a reference ``ALBEFMultimodalEncoder``
    (models/albef/multimodal_encoder.py:184) to ALBEFMultimodalEncoder
    params."""
    sd = {k: v for k, v in torch_model.state_dict().items()}
    params: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"layer.{i}"
        params[f"layer_{i}"] = {
            "attention": _ndim_mha(sd, f"{p}.attention"),
            "cross_attention": _ndim_mha(sd, f"{p}.cross_attention"),
            "feedforward": _mlp_generic(sd, f"{p}.feedforward"),
            "attention_layernorm": _fp32_layernorm(sd, f"{p}.attention_layernorm"),
            "cross_attention_layernorm": _fp32_layernorm(
                sd, f"{p}.cross_attention_layernorm"
            ),
            "feedforward_layernorm": _fp32_layernorm(
                sd, f"{p}.feedforward_layernorm"
            ),
        }
    return {"params": params}


def distilbert_params_from_torch(sd: Mapping, n_layers: int = 6) -> Dict[str, Any]:
    """HuggingFace ``DistilBertModel`` state dict -> variables for
    :func:`~multimodal_tpu.modules.encoders.bert_text_encoder.bert_text_encoder`
    (the MUGEN VideoCLIP text tower, reference
    examples/mugen/retrieval/video_clip.py:43 wraps DistilBertModel).

    DistilBERT is a post-norm BERT without token-type embeddings; the
    token-type table is zero-filled so ``token_type_ids=None`` adds nothing.
    """
    hidden = _t2j(sd["embeddings.word_embeddings.weight"]).shape[1]
    emb = {
        "word_embeddings": _embedding(sd, "embeddings.word_embeddings"),
        "position_embeddings": _embedding(sd, "embeddings.position_embeddings"),
        "token_type_embeddings": {"embedding": np.zeros((2, hidden), np.float32)},
        "layer_norm": _fp32_layernorm(sd, "embeddings.LayerNorm"),
    }
    enc: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"transformer.layer.{i}"
        kernel = np.concatenate(
            [
                _t2j(sd[f"{p}.attention.q_lin.weight"]).T,
                _t2j(sd[f"{p}.attention.k_lin.weight"]).T,
                _t2j(sd[f"{p}.attention.v_lin.weight"]).T,
            ],
            axis=1,
        )
        bias = np.concatenate(
            [
                _t2j(sd[f"{p}.attention.q_lin.bias"]),
                _t2j(sd[f"{p}.attention.k_lin.bias"]),
                _t2j(sd[f"{p}.attention.v_lin.bias"]),
            ]
        )
        enc[f"layer_{i}"] = {
            "attention": {
                "input_proj": {"kernel": kernel, "bias": bias},
                "output_proj": _linear(sd, f"{p}.attention.out_lin"),
            },
            "feedforward": {
                "hidden_0": _linear(sd, f"{p}.ffn.lin1"),
                "out": _linear(sd, f"{p}.ffn.lin2"),
            },
            "attention_layernorm": _fp32_layernorm(sd, f"{p}.sa_layer_norm"),
            "feedforward_layernorm": _fp32_layernorm(sd, f"{p}.output_layer_norm"),
        }
    return {"params": {"embeddings": emb, "encoder": enc}}


def hf_bert_params_from_torch(
    sd: Mapping, n_layers: int = 12, include_pooler: bool = False
) -> Dict[str, Any]:
    """HuggingFace ``BertModel`` state dict -> variables for
    :func:`~multimodal_tpu.modules.encoders.bert_text_encoder.bert_text_encoder`
    — loads real bert-base-uncased checkpoints into the BERT text tower
    (reference analog: BERTTextEncoder docstring points at HF BERT,
    modules/encoders/bert_text_encoder.py:17)."""
    emb = {
        "word_embeddings": _embedding(sd, "embeddings.word_embeddings"),
        "position_embeddings": _embedding(sd, "embeddings.position_embeddings"),
        "token_type_embeddings": _embedding(sd, "embeddings.token_type_embeddings"),
        "layer_norm": _fp32_layernorm(sd, "embeddings.LayerNorm"),
    }
    enc: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        enc[f"layer_{i}"] = {
            "attention": {
                "input_proj": _fused_qkv(sd, f"{p}.attention.self"),
                "output_proj": _linear(sd, f"{p}.attention.output.dense"),
            },
            "feedforward": {
                "hidden_0": _linear(sd, f"{p}.intermediate.dense"),
                "out": _linear(sd, f"{p}.output.dense"),
            },
            "attention_layernorm": _fp32_layernorm(sd, f"{p}.attention.output.LayerNorm"),
            "feedforward_layernorm": _fp32_layernorm(sd, f"{p}.output.LayerNorm"),
        }
    params = {"embeddings": emb, "encoder": enc}
    if include_pooler and "pooler.dense.weight" in sd:
        params["pooler"] = {"dense": _linear(sd, "pooler.dense")}
    return {"params": params}


def _hf_clip_layers(sd: Mapping, prefix: str, n_layers: int) -> Dict[str, Any]:
    """HuggingFace CLIPEncoderLayer stack -> the framework's CLIP encoder
    naming (separate q/k/v linears fused into in_proj)."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        kernel = np.concatenate(
            [
                _t2j(sd[f"{p}.self_attn.q_proj.weight"]).T,
                _t2j(sd[f"{p}.self_attn.k_proj.weight"]).T,
                _t2j(sd[f"{p}.self_attn.v_proj.weight"]).T,
            ],
            axis=1,
        )
        bias = np.concatenate(
            [
                _t2j(sd[f"{p}.self_attn.q_proj.bias"]),
                _t2j(sd[f"{p}.self_attn.k_proj.bias"]),
                _t2j(sd[f"{p}.self_attn.v_proj.bias"]),
            ]
        )
        out[f"layer_{i}"] = {
            "in_proj": {"kernel": kernel, "bias": bias},
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{p}.mlp.fc1"),
            "linear2": _linear(sd, f"{p}.mlp.fc2"),
            "norm1": _layernorm(sd, f"{p}.layer_norm1"),
            "norm2": _layernorm(sd, f"{p}.layer_norm2"),
        }
    return out


def hf_clip_params_from_torch(
    sd: Mapping, n_vision_layers: int = 12, n_text_layers: int = 12
) -> Dict[str, Any]:
    """HuggingFace ``CLIPModel`` state dict -> Flax params for
    :func:`~multimodal_tpu.models.clip.model.clip_vit_b32`-style builders —
    loads real openai/clip-vit-* checkpoints distributed through the Hub
    (same architecture as the reference's CLIP_MODEL_MAPPING weights,
    models/clip/model.py:24-33)."""
    vision = {
        "conv": {
            "kernel": _t2j(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        },
        "cls_token_embedding": _t2j(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _t2j(sd["vision_model.embeddings.position_embedding.weight"]),
        "ln_pre": _fp32_layernorm(sd, "vision_model.pre_layrnorm"),
        "encoder": _hf_clip_layers(sd, "vision_model.encoder", n_vision_layers),
        "ln_post": _fp32_layernorm(sd, "vision_model.post_layernorm"),
        # HF Linear y = x W^T; the framework stores the (width, embed) matrix
        "projection": _t2j(sd["visual_projection.weight"]).T,
    }
    text = {
        "token_embedding": _embedding(sd, "text_model.embeddings.token_embedding"),
        "positional_embedding": _t2j(sd["text_model.embeddings.position_embedding.weight"]),
        "encoder": _hf_clip_layers(sd, "text_model.encoder", n_text_layers),
        "ln_final": _fp32_layernorm(sd, "text_model.final_layer_norm"),
        "projection": {"kernel": _t2j(sd["text_projection.weight"]).T},
    }
    return {"params": {"encoder_a": vision, "encoder_b": text}}


def hf_vit_params_from_torch(sd: Mapping, n_layers: int = 12) -> Dict[str, Any]:
    """HuggingFace ``ViTModel`` state dict -> variables for
    :func:`~multimodal_tpu.modules.encoders.vision_transformer.vision_transformer`
    — loads real google/vit-* Hub checkpoints into the shared ViT tower
    (reference analog: modules/encoders/vision_transformer.py builders).
    HF ViT is pre-norm with layer_norm_eps=1e-12; build the tower with
    ``layer_norm_eps=1e-12, final_layer_norm_eps=1e-12``."""
    emb = {
        "cls_token": _t2j(sd["embeddings.cls_token"]),
        "position_embeddings": _t2j(sd["embeddings.position_embeddings"]),
        "conv_projection": _conv2d_nchw(sd, "embeddings.patch_embeddings.projection"),
    }
    enc: Dict[str, Any] = {}
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        enc[f"layer_{i}"] = {
            "attention": {
                "input_proj": _fused_qkv(sd, f"{p}.attention.attention"),
                "output_proj": _linear(sd, f"{p}.attention.output.dense"),
            },
            "feedforward": {
                "hidden_0": _linear(sd, f"{p}.intermediate.dense"),
                "out": _linear(sd, f"{p}.output.dense"),
            },
            "attention_layernorm": _fp32_layernorm(sd, f"{p}.layernorm_before"),
            "feedforward_layernorm": _fp32_layernorm(sd, f"{p}.layernorm_after"),
        }
    enc["final_layer_norm"] = _fp32_layernorm(sd, "layernorm")
    return {"params": {"embeddings": emb, "encoder": enc}}
