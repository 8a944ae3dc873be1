"""FLAVA scaling-config structure tests (shape-only, no allocation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.flava.configs import FLAVA_CONFIGS
from multimodal_tpu.models.flava.model import flava_model


def _param_count(config):
    model = flava_model(**config)
    image = jnp.zeros((1, 224, 224, 3))
    text = jnp.zeros((1, 16), jnp.int32)
    shapes = jax.eval_shape(
        lambda rng: model.init(rng, image=image, text=text, text_masked=text),
        jax.random.PRNGKey(0),
    )
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes))


@pytest.mark.parametrize(
    "name,lo,hi",
    [
        ("900m", 0.75e9, 1.1e9),
        pytest.param("10b", 9e9, 11.5e9, marks=pytest.mark.slow),
    ],
)
def test_flava_scaling_param_counts(name, lo, hi):
    n = _param_count(FLAVA_CONFIGS[name])
    assert lo < n < hi, f"{name}: {n / 1e9:.2f}B params"
