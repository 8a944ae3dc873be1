"""Continuous-batching serving of MultimodalGPT generation (text→video /
video→video).

The reference's only generation surface is the offline, one-batch
``GenerationUtil.sample`` loop (``utils/generate.py``, reference
``utils/generate.py:61``). This adapter puts the same model behind
``serving.InferenceEngine``, so video-generation requests get continuous
batching, bucketed/chunked prefill, multi-step decode scheduling, int8 KV
— the whole production path — while reproducing the sampler's exact
token-level semantics (tests assert greedy equality).

How the GPT's conventions map onto the engine's LM surface
(``apply(params, tokens, positions=, past_key_values=, cache_index=,
attention_mask=, use_cache=True) -> (logits, kvs)``):

  - The GPT is trained right-shifted: the input at sequence position q is
    ``emb(token(q-1)) + pos_emb(q-1)`` and position 0's input is the
    learned SOS embedding alone (``RightShift``; pos-emb is added BEFORE
    the shift, so the SOS row carries none). Feeding the engine's token
    at write position p therefore uses the token's own modality index
    ``p - 1`` (in) / ``p - 1 - in_seq_len`` (out) for the position
    embedding, and logits at p predict the token at p — exactly the
    engine's next-token contract.
  - The SOS row is a registered PREFIX: ``VideoGPTServer`` registers the
    1-token prefix ``[SOS_ID]`` once; every request rides it. That keeps
    the adapter a pure next-token LM — no shift special-casing in any
    engine path (bucketed, chunked, decode all line up).
  - One unified id space: ids ``< num_in`` are input-modality, the rest
    output-modality (offset by ``num_in``). Logits are masked to the
    output modality (``get_logits_mask``), mirroring the sampler's
    modality-restricted decoding (reference ``video_gpt/gpt.py:278-292``).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.serving.engine import InferenceEngine, Request
from multimodal_tpu.utils.generate import get_logits_mask


class VideoGPTServingAdapter(nn.Module):
    """Wraps a ``MultimodalGPT`` in the engine's causal-LM decode surface.

    ``in_seq_len`` is the (fixed) input-modality prompt length — the
    modality boundary of the trained model; prompts must be exactly this
    long. ``in_positions``/``out_positions`` bound the per-modality
    position-embedding tables (default: read ``num_positions`` off the
    embedding modules).
    """

    gpt: nn.Module
    in_seq_len: int
    in_positions: Optional[int] = None
    out_positions: Optional[int] = None

    @property
    def sos_id(self) -> int:
        return self.gpt.num_in_tokens + self.gpt.num_out_tokens

    def _positions_bound(self, which: str) -> int:
        given = self.in_positions if which == "in" else self.out_positions
        if given is not None:
            return given
        emb = (
            self.gpt.mm_decoder.in_pos_emb if which == "in"
            else self.gpt.mm_decoder.out_pos_emb
        )
        return emb.num_positions

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,
        past_key_values: Optional[tuple] = None,
        cache_index: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
    ):
        gpt = self.gpt
        num_in = gpt.num_in_tokens
        num_out = gpt.num_out_tokens
        b, s = tokens.shape
        if positions is None:
            positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :], (b, s)
            )
        is_sos = tokens == self.sos_id
        is_in = tokens < num_in

        # token embeddings, both modalities computed and selected (the
        # inactive branch reads clipped-safe ids)
        in_emb = gpt.lookup(jnp.clip(tokens, 0, num_in - 1), "in")
        if gpt.use_in_projection:
            in_emb = gpt.in_projection(in_emb)
        out_emb = gpt.lookup(
            jnp.clip(tokens - num_in, 0, num_out - 1), "out"
        )
        if gpt.use_out_projection:
            out_emb = gpt.out_projection(out_emb)
        emb = jnp.where(is_in[..., None], in_emb, out_emb)

        # per-modality position index of the FED token (write pos - 1)
        in_pos = jnp.clip(positions - 1, 0, self._positions_bound("in") - 1)
        out_pos = jnp.clip(
            positions - 1 - self.in_seq_len,
            0,
            self._positions_bound("out") - 1,
        )
        pe = jnp.where(
            is_in[..., None],
            gpt.mm_decoder.in_pos_emb(in_pos).astype(emb.dtype),
            gpt.mm_decoder.out_pos_emb(out_pos).astype(emb.dtype),
        )
        x = emb + pe
        # SOS rows: the learned start embedding alone (RightShift of a
        # length-1 zero sequence returns exactly the sos vector)
        sos = gpt.mm_decoder.right_shift(jnp.zeros_like(x[:, :1]))
        x = jnp.where(is_sos[..., None], sos, x)

        out = gpt.mm_decoder.decoder(
            x, attention_mask, None, use_cache, False,
            past_key_values=past_key_values, cache_index=cache_index,
        )
        logits_mask = get_logits_mask(
            in_seq_len=0, out_seq_len=1,
            num_in_tokens=num_in, num_out_tokens=num_out,
        )
        logits = gpt.logit_projection(out.last_hidden_states, logits_mask)
        return logits, out.past_key_values


def wrap_gpt_variables(variables) -> dict:
    """GPT variable collections re-rooted under the adapter's ``gpt``
    child scope."""
    return {col: {"gpt": sub} for col, sub in variables.items()}


class VideoGPTServer:
    """Continuous-batching video generation server.

    Args:
        gpt: a ``MultimodalGPT`` module.
        variables: its variable collections.
        in_seq_len: fixed input-modality prompt length (e.g. the MUGEN
            text length); every submitted prompt must match.
        n_slots/max_new_tokens/engine_kwargs: engine pool geometry —
            ``max_new_tokens`` defaults to the full output latent volume.
    """

    def __init__(
        self,
        gpt,
        variables,
        in_seq_len: int,
        n_slots: int = 8,
        max_new_tokens: Optional[int] = None,
        **engine_kwargs: Any,
    ):
        import math

        self.gpt = gpt
        self.variables = variables
        self.num_in = gpt.num_in_tokens
        self.in_seq_len = in_seq_len
        self.max_new_tokens = (
            max_new_tokens
            if max_new_tokens is not None
            else math.prod(gpt.latent_shape)
        )
        adapter = VideoGPTServingAdapter(gpt=gpt, in_seq_len=in_seq_len)
        layers = gpt.mm_decoder.decoder.num_layers
        n_head = gpt.mm_decoder.decoder.n_head
        max_len = 1 + in_seq_len + self.max_new_tokens
        self.engine = InferenceEngine(
            adapter,
            wrap_gpt_variables(variables),
            n_slots=n_slots,
            max_len=max_len,
            n_layer=layers,
            n_head=n_head,
            head_dim=gpt.d_model // n_head,
            **engine_kwargs,
        )
        self._sos_id = gpt.num_in_tokens + gpt.num_out_tokens
        self.engine.register_prefix("sos", [self._sos_id])

    def submit(
        self,
        in_tokens: Sequence[int],
        request_id: Any = None,
        temperature: float = 0.0,
        max_new_tokens: Optional[int] = None,
    ) -> None:
        """Queue a generation request. ``in_tokens`` are input-modality ids
        (``[0, num_in)``), exactly ``in_seq_len`` long."""
        if len(in_tokens) != self.in_seq_len:
            raise ValueError(
                f"prompt must be exactly in_seq_len={self.in_seq_len} "
                f"input-modality tokens, got {len(in_tokens)}"
            )
        self.engine.submit(
            Request(
                list(in_tokens),
                max_new_tokens=max_new_tokens or self.max_new_tokens,
                temperature=temperature,
                request_id=request_id,
                prefix="sos",
            )
        )

    def run(self) -> List:
        """Drain the queue; outputs carry OUTPUT-MODALITY token ids
        (unified ids with the ``num_in`` offset removed)."""
        outs = self.engine.run()
        for o in outs:
            o.tokens = [t - self.num_in for t in o.tokens]
        return outs

    def decode_videos(self, tokens: np.ndarray):
        """Output-modality latent ids ``(b, prod(latent_shape))`` → pixels
        through the VQ-VAE decoder."""
        return self.gpt.apply(
            self.variables, jnp.asarray(tokens),
            method=type(self.gpt).decode,
        )
