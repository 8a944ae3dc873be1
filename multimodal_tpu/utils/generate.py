"""Autoregressive generation utilities.

Parity with reference ``utils/generate.py`` (GenerationUtil:32, sample:61,
get_logits_mask:175, LogitsFilterTopK:215, LogitsFilterTopP:267).

TPU-native decode loop: the reference's Python while-loop with growing dict
KV caches becomes a single ``lax.scan`` over a PREALLOCATED fixed-size cache
written via ``dynamic_update_slice`` (one compile, no per-step retrace), with
an index-derived attention mask over the valid prefix. Sampling uses
``jax.random.categorical`` on the filtered logits.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SampleOutput(NamedTuple):
    decoded: Any
    tokens: jnp.ndarray


def get_logits_mask(
    in_seq_len: int = 0,
    out_seq_len: int = 0,
    num_in_tokens: int = 0,
    num_out_tokens: int = 0,
) -> jnp.ndarray:
    """1 = allowed: in-positions may predict in-tokens, out-positions out-tokens."""
    mask = jnp.zeros((in_seq_len + out_seq_len, num_in_tokens + num_out_tokens))
    mask = mask.at[in_seq_len:, num_in_tokens:].set(1)
    mask = mask.at[:in_seq_len, :num_in_tokens].set(1)
    return mask


def logits_filter_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep the top_k logits per row; mask the rest to -inf (reference :215)."""
    if top_k <= 0:
        return logits
    top_k = min(top_k, logits.shape[-1])
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    return jnp.where(logits < kth, -jnp.inf, logits)


def logits_filter_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens whose cumulative
    probability exceeds top_p (reference :267)."""
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # tokens with cumulative prob (exclusive) >= top_p are removed; the first
    # token always survives since its exclusive-cumulative is 0
    keep_mask = (cum - probs) < top_p
    threshold = jnp.min(
        jnp.where(keep_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits >= threshold, logits, -jnp.inf)


def filter_logits_per_row(
    logits: jnp.ndarray, top_k: jnp.ndarray, top_p: jnp.ndarray
) -> jnp.ndarray:
    """Vectorized per-row top-k then nucleus filtering (continuous
    batching: every slot carries its own sampling params), matching the
    sequential semantics of ``_filter_logits``. ``top_k`` (b,) int32 with
    0 = disabled; ``top_p`` (b,) float with >= 1.0 = disabled."""
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    k_eff = jnp.clip(top_k, 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
    k_masked = jnp.where(logits < kth, -jnp.inf, logits)
    out = jnp.where((top_k > 0)[:, None], k_masked, logits)

    # nucleus over the (possibly) k-filtered distribution — sequential,
    # like applying logits_filter_top_k then logits_filter_top_p
    sorted_out = jnp.sort(out, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_out, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p[:, None]
    threshold = jnp.min(
        jnp.where(keep, sorted_out, jnp.inf), axis=-1, keepdims=True
    )
    p_masked = jnp.where(out >= threshold, out, -jnp.inf)
    return jnp.where((top_p < 1.0)[:, None], p_masked, out)


def _filter_logits(logits, top_k: Optional[int], top_p: Optional[float]):
    if top_k is not None:
        logits = logits_filter_top_k(logits, top_k)
    if top_p is not None:
        logits = logits_filter_top_p(logits, top_p)
    return logits


class GenerationUtil:
    """Scan-based sampler over a MultimodalGPT-style flax module.

    Args:
        model: the MultimodalGPT module (architecture).
        variables: its variable collections (params etc.).
    """

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self.num_in_tokens = model.num_in_tokens
        self.num_out_tokens = model.num_out_tokens

    def sample(
        self,
        x: jnp.ndarray,
        max_seq_len: int,
        rng: jax.Array,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        **model_kwargs: Any,
    ) -> SampleOutput:
        model, variables = self.model, self.variables
        num_in_tokens = self.num_in_tokens

        in_tokens = model.apply(
            variables, x, "in", method=type(model).encode, **model_kwargs
        )
        batch_size, in_seq_len = in_tokens.shape
        total_len = in_seq_len + max_seq_len
        logits_mask = get_logits_mask(
            in_seq_len=0, out_seq_len=1,
            num_in_tokens=self.num_in_tokens, num_out_tokens=self.num_out_tokens,
        )

        # 1) Prime: right-shifted input modality fills cache slots [0, in_seq_len)
        prime_out = model.apply(
            variables,
            in_tokens=in_tokens,
            use_cache=True,
            causal=True,
            right_shift=True,
            method=type(model).fwd,
        )
        caches = prime_out.past_key_values  # tuple of (k, v), seq = in_seq_len

        # Preallocate full-length caches
        def pad_cache(kv):
            k, v = kv
            pad = total_len - k.shape[2]
            pad_widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            return (jnp.pad(k, pad_widths), jnp.pad(v, pad_widths))

        caches = tuple(pad_cache(kv) for kv in caches)

        def valid_mask(write_idx):
            # keys at positions <= write_idx are valid
            return (jnp.arange(total_len)[None, None, None, :] <= write_idx)

        def decode_step(carry_token, pos_id, is_in_modality, caches, write_idx, step_rng):
            kwargs = dict(
                logits_mask=logits_mask,
                use_cache=True,
                causal=False,
                right_shift=False,
                attn_mask=valid_mask(write_idx),
                past_key_values=caches,
                cache_index=write_idx,
            )
            if is_in_modality:
                out = model.apply(
                    variables, in_tokens=carry_token,
                    in_pos_ids=pos_id, **kwargs,
                )
            else:
                out = model.apply(
                    variables, out_tokens=carry_token,
                    out_pos_ids=pos_id, **kwargs,
                )
            logits = out.logits.reshape(batch_size, -1)
            logits = _filter_logits(logits, top_k, top_p)
            sample = jax.random.categorical(step_rng, logits, axis=-1)
            token = (sample - num_in_tokens)[:, None]  # (b, 1) out-modality id
            return token, out.decoder_output.past_key_values

        # 2) Step 0 (outside scan): feed last in-token as the out-modality SOS
        rng, step_rng = jax.random.split(rng)
        first_token, caches = decode_step(
            in_tokens[:, -1:],
            jnp.full((batch_size, 1), in_seq_len - 1, jnp.int32),
            True, caches, jnp.asarray(in_seq_len), step_rng,
        )

        # 3) Remaining steps: one compiled scan over out-modality tokens
        def scan_body(carry, step):
            token, caches, rng = carry
            rng, step_rng = jax.random.split(rng)
            pos_id = jnp.full((batch_size, 1), step - 1, jnp.int32)
            new_token, caches = decode_step(
                token, pos_id, False, caches, in_seq_len + step, step_rng
            )
            return (new_token, caches, rng), token

        (last_token, _, _), sampled = jax.lax.scan(
            scan_body, (first_token, caches, rng), jnp.arange(1, max_seq_len)
        )
        # sampled: (max_seq_len - 1, b, 1) tokens emitted before each step
        tokens = jnp.concatenate(
            [jnp.moveaxis(sampled, 0, 1)[:, :, 0], last_token], axis=1
        ) if max_seq_len > 1 else last_token
        decoded = model.apply(variables, tokens, method=type(model).decode)
        return SampleOutput(decoded=decoded, tokens=tokens)
