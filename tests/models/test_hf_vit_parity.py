"""Vision-transformer parity vs the REAL HuggingFace ViTModel at the full
vit-base config (12L/768/patch-16, 224px) — proves real google/vit-base Hub
checkpoints load into `vision_transformer` via `hf_vit_params_from_torch`."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.modules.encoders.vision_transformer import (  # noqa: E402
    vision_transformer,
)
from multimodal_tpu.utils.checkpoint import hf_vit_params_from_torch  # noqa: E402


@pytest.mark.slow
def test_vision_transformer_matches_real_hf_vit():
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(4)
    config = ViTConfig()  # vit-base: 12L/768/12H, patch 16, 224px
    ref = ViTModel(config, add_pooling_layer=False).eval()

    model = vision_transformer(
        patch_size=16, hidden_dim=768, dim_feedforward=3072,
        n_layer=12, n_head=12, image_size=224,
        layer_norm_eps=1e-12, final_layer_norm_eps=1e-12,
    )
    variables = hf_vit_params_from_torch(ref.state_dict(), n_layers=12)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 224, 224).astype(np.float32)

    with torch.no_grad():
        want = ref(pixel_values=torch.as_tensor(img)).last_hidden_state.numpy()

    got = np.asarray(
        jax.jit(model.apply)(
            variables, jnp.asarray(img.transpose(0, 2, 3, 1))
        ).last_hidden_state
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
