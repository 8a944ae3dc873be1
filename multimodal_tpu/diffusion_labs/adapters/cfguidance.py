"""Classifier-free guidance adapter.

Parity with reference ``diffusion_labs/modules/adapters/cfguidance.py``
(CFGuidance:15): learned/zero unconditional embeddings per condition key,
train-time per-sample condition dropout, inference-time guidance mixing
``(1 + g)·cond - g·uncond`` via a single doubled-batch forward.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.diffusion_labs.utils import DiffusionOutput


class CFGuidance(nn.Module):
    model: nn.Module
    dim_cond: Dict[str, Union[int, Sequence[int]]]
    p: Union[float, Dict[str, float]] = 0.1
    guidance: float = 0.0
    learn_null_emb: bool = True
    # fixed per-key overrides used in place of the learned null embedding at
    # eval time (reference ``eval_unconditional_embeddings``, cfguidance.py:67)
    eval_unconditional_embeddings: Optional[Dict[str, jnp.ndarray]] = None
    rng_collection: str = "cfguidance"

    def _probs(self) -> Dict[str, float]:
        if isinstance(self.p, (float, int)):
            return {k: float(self.p) for k in self.dim_cond}
        if set(self.p.keys()) != set(self.dim_cond.keys()):
            raise ValueError("p keys must match dim_cond keys")
        return dict(self.p)

    def _null_embeddings(self) -> Dict[str, jnp.ndarray]:
        init = nn.initializers.uniform(1.0) if self.learn_null_emb else nn.initializers.zeros
        out = {}
        for key, dim in self.dim_cond.items():
            shape = (1,) + (tuple(dim) if isinstance(dim, (tuple, list)) else (dim,))
            emb = self.param(f"uncond_{key}", init, shape, jnp.float32)
            if not self.learn_null_emb:
                emb = jax.lax.stop_gradient(emb)
            out[key] = emb
        return out

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timestep: jnp.ndarray,
        conditional_inputs: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> DiffusionOutput:
        conditional_inputs = conditional_inputs or {}
        conditions = {k: v for k, v in conditional_inputs.items() if k in self.dim_cond}
        others = {k: v for k, v in conditional_inputs.items() if k not in self.dim_cond}
        b = x.shape[0]
        nulls = self._null_embeddings()
        if deterministic and self.eval_unconditional_embeddings is not None:
            nulls = {
                k: jnp.asarray(self.eval_unconditional_embeddings.get(k, v))
                for k, v in nulls.items()
            }
        probs = self._probs()

        if not deterministic:
            # train: randomly replace conditions with the null embedding
            rng = self.make_rng(self.rng_collection)
            embedding = {}
            for k, uncond in nulls.items():
                if k in conditions:
                    cond = conditions[k]
                    rng, sub = jax.random.split(rng)
                    drop = jax.random.uniform(sub, (b,) + (1,) * (cond.ndim - 1)) < probs[k]
                    embedding[k] = jnp.where(drop, uncond.astype(cond.dtype), cond)
                else:
                    embedding[k] = jnp.broadcast_to(uncond, (b,) + uncond.shape[1:])
            embedding.update(others)
            return self.model(x, timestep, embedding)

        if self.guidance == 0 or not conditions:
            embedding = {}
            for k, uncond in nulls.items():
                embedding[k] = conditions.get(
                    k, jnp.broadcast_to(uncond, (b,) + uncond.shape[1:])
                )
            embedding.update(others)
            return self.model(x, timestep, embedding)

        # inference with guidance: doubled batch (cond; uncond)
        embedding = {}
        for k, uncond in nulls.items():
            if k in conditions:
                cond = conditions[k]
                embedding[k] = jnp.concatenate(
                    [cond, jnp.broadcast_to(uncond.astype(cond.dtype), cond.shape)], axis=0
                )
            else:
                embedding[k] = jnp.broadcast_to(uncond, (2 * b,) + uncond.shape[1:])
        embedding.update({k: jnp.concatenate([v, v], axis=0) for k, v in others.items()})
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([timestep, timestep], axis=0)
        out = self.model(x2, t2, embedding)
        cond_pred, uncond_pred = jnp.split(out.prediction, 2, axis=0)
        prediction = (1 + self.guidance) * cond_pred - self.guidance * uncond_pred
        variance_value = out.variance_value
        if variance_value is not None:
            variance_value = jnp.split(variance_value, 2, axis=0)[0]
        return out.replace(prediction=prediction, variance_value=variance_value)
