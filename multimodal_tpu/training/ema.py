"""EMA model tracking.

Analog of the reference Omnivore trainer's EMA-model option
(``examples/omnivore/train.py``): maintain an exponential moving average of
the param pytree, evaluated instead of the live params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.array, params)


def update_ema(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + jax.lax.stop_gradient(p) * (1.0 - decay),
        ema_params, params,
    )
