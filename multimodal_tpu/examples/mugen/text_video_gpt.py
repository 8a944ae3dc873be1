"""MUGEN text->video generation model.

Parity with reference ``examples/mugen/generation/text_video_gpt.py:36``
(text_video_gpt): assembles a BPE text tokenizer, a pretrained video
VQ-VAE, and MultimodalGPT for text-conditioned video generation.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.models.video_gpt.gpt import (
    MultimodalGPT,
    MultimodalTransformerDecoder,
    RightShift,
    TransformerDecoder,
)
from multimodal_tpu.models.video_gpt.model import video_vqvae
from multimodal_tpu.modules.layers.position_embedding import (
    BroadcastedPositionEmbedding,
)
from multimodal_tpu.transforms.clip_transform import CLIPBPETokenizer


class TextTokenizer(nn.Module):
    """BPE text tokenizer as an in/out-tokenizer for MultimodalGPT.

    Exposes ``encode``/``lookup`` (and ``decode`` host-side). The embedding
    lookup is a learned table over the BPE vocab (reference
    text_video_gpt.py TextTokenizer semantics).
    """

    context_len: int
    vocab_size: int
    embedding_dim: int
    bpe_path: Optional[str] = None
    param_dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.embedding_dim, param_dtype=self.param_dtype,
            name="embedding_table",
        )
        self._bpe = None
        if self.bpe_path is not None:
            self._bpe = CLIPBPETokenizer(self.bpe_path)

    def tokenize_host(self, sentences: List[str]) -> np.ndarray:
        """Host-side string -> padded token id batch."""
        if self._bpe is None:
            raise ValueError("bpe_path required for host-side tokenization")
        out = np.zeros((len(sentences), self.context_len), np.int32)
        for i, s in enumerate(sentences):
            ids = self._bpe.encode(s)[: self.context_len]
            out[i, : len(ids)] = ids
        return out

    def encode(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """Token ids pass through (already discrete)."""
        return token_ids

    def lookup(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embedding(token_ids)


def text_video_gpt(
    text_seq_len: int = 128,
    video_seq_len: int = 32,
    resolution: int = 256,
    downsample: Tuple[int, int, int] = (4, 32, 32),
    d_model: int = 768,
    n_head: int = 8,
    dropout: float = 0.2,
    attn_dropout: float = 0.3,
    num_decoder_layers: int = 12,
    text_vocab_size: int = 49408,
    bpe_path: Optional[str] = None,
    vqvae_kwargs: Optional[dict] = None,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> MultimodalGPT:
    """Text->video MultimodalGPT (reference text_video_gpt.py:36)."""
    latent_shape = (
        video_seq_len // downsample[0],
        resolution // downsample[1],
        resolution // downsample[2],
    )
    in_tokenizer = TextTokenizer(
        context_len=text_seq_len, vocab_size=text_vocab_size,
        embedding_dim=d_model, bpe_path=bpe_path, param_dtype=param_dtype,
    )
    out_tokenizer = video_vqvae(dtype=dtype, param_dtype=param_dtype,
                                **(vqvae_kwargs or {}))

    in_pos_emb = BroadcastedPositionEmbedding((text_seq_len,), d_model, param_dtype=param_dtype)
    out_pos_emb = BroadcastedPositionEmbedding(latent_shape, d_model, param_dtype=param_dtype)
    decoder = TransformerDecoder(
        num_layers=num_decoder_layers, d_model=d_model, n_head=n_head,
        dropout=dropout, attn_dropout=attn_dropout,
        dtype=dtype, param_dtype=param_dtype,
    )
    mm_decoder = MultimodalTransformerDecoder(
        in_pos_emb, out_pos_emb, decoder, RightShift(d_model, param_dtype=param_dtype)
    )
    return MultimodalGPT(
        d_model=d_model,
        num_in_tokens=text_vocab_size,
        num_out_tokens=out_tokenizer.num_embeddings,
        latent_shape=latent_shape,
        in_tokenizer=in_tokenizer,
        out_tokenizer=out_tokenizer,
        mm_decoder=mm_decoder,
        use_in_projection=False,  # text embeddings already at d_model
        use_out_projection=True,
        dtype=dtype,
        param_dtype=param_dtype,
    )
