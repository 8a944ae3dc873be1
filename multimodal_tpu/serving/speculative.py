"""Speculative decoding: a small draft model proposes, the target verifies.

Serving-path capability beyond the reference. Greedy acceptance: the draft
LM autoregressively proposes ``gamma`` tokens (cheap — small weights), then
the target scores all ``gamma + 1`` positions in ONE forward (one weight
read amortized over up to ``gamma + 1`` emitted tokens) and keeps the
longest prefix that matches its own argmax, plus its argmax at the first
mismatch as a bonus token. The output is therefore IDENTICAL to target-only
greedy decoding (tested token-for-token in ``tests/serving``) — the draft
only changes how many target forwards are needed, never what is produced.

TPU-native structure: both models run fixed-buffer KV caches
(``cache_index`` writes, valid-prefix masks — the same machinery as
``serving/engine.py``); the draft's proposal loop is a compiled
``lax.scan``; the target's verify is one compiled call whose query block
attends ``position <= L - 1 + i`` so causality inside the proposal window
falls out of the same mask that guards the cache prefix. Rejected cache
rows are simply re-written on later rounds (writes always advance through
positions in order, and the mask hides anything past the current length).

Reference point for the technique: Leviathan et al., "Fast Inference from
Transformers via Speculative Decoding" (greedy case).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class SpeculativeDecoder:
    """Greedy speculative decoding over two LongContextLM-surface models.

    Args:
        target_model/target_params: the model whose greedy output is wanted.
        draft_model/draft_params: a cheaper proposal model (same
            vocabulary).
        max_len: fixed KV capacity for both caches.
        gamma: proposal window (draft tokens per round).
    """

    def __init__(
        self,
        target_model,
        target_params,
        draft_model,
        draft_params,
        max_len: int,
        gamma: int = 4,
        cache_dtype=jnp.bfloat16,
    ):
        self.target_model = target_model
        self.target_params = target_params
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.max_len = max_len
        self.gamma = gamma
        self.cache_dtype = cache_dtype
        self.rounds = 0  # target forwards issued (diagnostic)

    def _empty_cache(self, model):
        head_dim = model.d_model // model.n_head
        kv = (1, model.n_head, self.max_len, head_dim)
        return tuple(
            (jnp.zeros(kv, self.cache_dtype), jnp.zeros(kv, self.cache_dtype))
            for _ in range(model.n_layer)
        )

    @partial(jax.jit, static_argnums=(0, 1))
    def _prefill(self, model, params, cache, tokens):
        """Write the prompt context's KV rows into positions
        ``[0, len(tokens))`` of the cache (the final prompt token is not
        passed here — it is re-fed as the first round's current token)."""
        _logits, kvs = model.apply(params, tokens, use_cache=True)
        return tuple(
            (
                jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype), (0, 0, 0, 0)
                ),
                jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype), (0, 0, 0, 0)
                ),
            )
            for (ck, cv), (k, v) in zip(cache, kvs)
        )

    @partial(jax.jit, static_argnums=(0,))
    def _draft_propose(self, params, cache, token, pos):
        """``gamma`` greedy draft steps from ``token`` at ``pos``; returns
        the proposed tokens and the updated draft cache."""
        model = self.draft_model

        def tick(carry, _):
            token, pos, cache = carry
            mask = (
                jnp.arange(self.max_len)[None, None, None, :] <= pos
            )
            logits, cache = model.apply(
                params, token[None, None], positions=pos[None, None],
                past_key_values=cache, cache_index=pos[None],
                attention_mask=mask, use_cache=True,
            )
            nxt = jnp.argmax(logits[0, 0]).astype(jnp.int32)
            return (nxt, pos + 1, cache), nxt

        # gamma + 1 steps: the extra step feeds the last proposal so its KV
        # row lands in the cache too — otherwise a fully-accepted round
        # leaves a hole at position pos + gamma that poisons every later
        # draft pass (output would stay correct, acceptance would collapse)
        (_, _, cache), proposed = jax.lax.scan(
            tick, (token, pos, cache), None, length=self.gamma + 1
        )
        return proposed[: self.gamma], cache

    @partial(jax.jit, static_argnums=(0,))
    def _target_verify(self, params, cache, window, pos):
        """One target forward over ``[cur, p_1 .. p_gamma]`` at positions
        ``pos .. pos + gamma``; returns the target's argmax at every
        position and the updated target cache."""
        g1 = self.gamma + 1
        positions = pos + jnp.arange(g1)
        mask = (
            jnp.arange(self.max_len)[None, None, None, :]
            <= positions[None, :, None, None]
        ).transpose(0, 2, 1, 3)  # (1, 1, g1, max_len)
        logits, cache = self.target_model.apply(
            params, window[None], positions=positions[None],
            past_key_values=cache, cache_index=pos[None],
            attention_mask=mask, use_cache=True,
        )
        return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), cache

    @partial(jax.jit, static_argnums=(0, 7), donate_argnums=(3, 4))
    def _generate_loop(
        self, t_params, d_params, t_cache, d_cache, cur, pos, max_new, eos_id
    ):
        """The WHOLE propose/verify/accept loop as one compiled program
        (``lax.while_loop``): a generation costs two device calls total
        (prefill + this), regardless of round count — no per-round host
        sync, which is what makes speculative decoding actually pay on a
        remote-dispatch runtime."""
        g = self.gamma
        slack = max_new + g + 1  # last round may scribble past max_new

        def cond(state):
            out, n_out, cur, pos, t_cache, d_cache, done, rounds = state
            return jnp.logical_and(n_out < max_new, jnp.logical_not(done))

        def body(state):
            out, n_out, cur, pos, t_cache, d_cache, done, rounds = state
            proposed, d_cache = self._draft_propose(
                d_params, d_cache, cur, pos
            )
            window = jnp.concatenate([cur[None], proposed])
            argmaxes, t_cache = self._target_verify(
                t_params, t_cache, window, pos
            )
            # longest proposal prefix matching the target's own greedy
            # choice, then the target's token at the first mismatch is free
            matches = (proposed == argmaxes[:g]).astype(jnp.int32)
            accepted = jnp.sum(jnp.cumprod(matches))
            emit = jnp.concatenate(
                [proposed, jnp.zeros((1,), jnp.int32)]
            ).at[accepted].set(argmaxes[accepted])
            k = accepted + 1
            # stop at eos (and truncate the emission there)
            idx = jnp.arange(g + 1)
            eos_hit = jnp.logical_and(emit == eos_id, idx < k)
            any_eos = jnp.any(eos_hit)
            k = jnp.where(any_eos, jnp.argmax(eos_hit) + 1, k)
            out = jax.lax.dynamic_update_slice(out, emit, (n_out,))
            n_out = n_out + k
            cur = emit[k - 1]
            pos = pos + k
            return (
                out, n_out, cur, pos, t_cache, d_cache,
                jnp.logical_or(done, any_eos), rounds + 1,
            )

        state = (
            jnp.zeros((slack,), jnp.int32), jnp.asarray(0, jnp.int32),
            cur, pos, t_cache, d_cache, jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        out, n_out, _, _, _, _, _, rounds = jax.lax.while_loop(
            cond, body, state
        )
        return out[:max_new], jnp.minimum(n_out, max_new), rounds

    def generate(
        self,
        prompt: Sequence[int],
        max_new_tokens: int,
        eos_id: Optional[int] = None,
    ) -> List[int]:
        """Greedy-decode ``max_new_tokens`` continuation tokens; output is
        token-identical to target-only greedy decoding (stopping at
        ``eos_id`` if given). Two device calls per generation."""
        if len(prompt) + max_new_tokens + self.gamma > self.max_len:
            raise ValueError("prompt + max_new_tokens + gamma exceeds max_len")
        prompt = np.asarray(prompt, np.int32)
        L = len(prompt)
        t_cache = self._empty_cache(self.target_model)
        d_cache = self._empty_cache(self.draft_model)
        if L > 1:
            ctx = jnp.asarray(prompt[None, :-1])
            t_cache = self._prefill(
                self.target_model, self.target_params, t_cache, ctx
            )
            d_cache = self._prefill(
                self.draft_model, self.draft_params, d_cache, ctx
            )
        out, n_out, rounds = self._generate_loop(
            self.target_params, self.draft_params, t_cache, d_cache,
            jnp.asarray(prompt[-1], jnp.int32), jnp.asarray(L - 1, jnp.int32),
            max_new_tokens,
            jnp.asarray(-1 if eos_id is None else eos_id, jnp.int32),
        )
        self.rounds = int(rounds)
        return np.asarray(out)[: int(n_out)].tolist()


def speculative_acceptance(
    proposed: jnp.ndarray,
    draft_probs: jnp.ndarray,
    target_probs: jnp.ndarray,
    rng: jax.Array,
):
    """Lossless rejection-sampling acceptance (Leviathan et al., App. A),
    batched over rows.

    Args:
      proposed: (b, gamma) draft tokens, each sampled from ``draft_probs``.
      draft_probs: (b, gamma, V) the distributions the draft ACTUALLY
        sampled from (post temperature/top-k/top-p).
      target_probs: (b, gamma+1, V) the target's distributions at the same
        positions (same warping).
      rng: PRNG key.

    Returns:
      (emit, k): ``emit`` (b, gamma+1) tokens of which the first ``k[i]``
      are valid for row i. Position j < k-1 carries an accepted proposal;
      position k-1 carries the residual-resample (on rejection) or the
      bonus token from the target's last distribution (full acceptance).
      Each emitted token is EXACTLY target-distributed: accepted w.p.
      min(1, q_t/q_d), else drawn from norm(max(q_t - q_d, 0)) — the
      mixture is q_t. Greedy rows fall out of the same rule when both
      probability tensors are one-hot (argmax match -> accept, mismatch ->
      reject with the residual collapsing to the target argmax).
    """
    b, g = proposed.shape
    rng_u, rng_e = jax.random.split(rng)
    u = jax.random.uniform(rng_u, (b, g))
    qt_i = jnp.take_along_axis(
        target_probs[:, :g], proposed[..., None], axis=-1
    )[..., 0]
    qd_i = jnp.take_along_axis(draft_probs, proposed[..., None], axis=-1)[..., 0]
    accept = (u * jnp.maximum(qd_i, 1e-20) <= qt_i).astype(jnp.int32)
    j = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)  # accepted count, 0..g
    # residual (or bonus, when j == g) distribution at the stop position
    qt_j = jnp.take_along_axis(
        target_probs, j[:, None, None], axis=1
    )[:, 0]
    qd_pad = jnp.concatenate(
        [draft_probs, jnp.zeros_like(draft_probs[:, :1])], axis=1
    )
    qd_j = jnp.take_along_axis(qd_pad, j[:, None, None], axis=1)[:, 0]
    resid = jnp.clip(qt_j - qd_j, 0.0, None)
    z = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(z > 1e-20, resid / jnp.maximum(z, 1e-20), qt_j)
    extra = jax.random.categorical(
        rng_e, jnp.log(jnp.maximum(resid, 1e-38)), axis=-1
    ).astype(jnp.int32)
    emit = jnp.concatenate(
        [proposed, jnp.zeros((b, 1), jnp.int32)], axis=1
    )
    emit = jnp.where(
        jnp.arange(g + 1)[None, :] == j[:, None], extra[:, None], emit
    )
    return emit, j + 1
