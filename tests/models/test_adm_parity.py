"""ADM U-Net converted-weight parity vs the reference implementation
(diffusion_labs/models/adm_unet/adm.py) — full forward with timestep +
context conditioning through both the residual and attention paths."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.diffusion_labs.models.adm_unet import ADMUNet  # noqa: E402
from multimodal_tpu.utils.checkpoint import adm_unet_params_from_torch  # noqa: E402

from tests.reference_compat import import_reference  # noqa: E402
from tests.test_utils import assert_expected  # noqa: E402

import_reference()

from torchmultimodal.diffusion_labs.models.adm_unet.adm import (  # noqa: E402
    ADMUNet as RefADMUNet,
)


def _build_ref(embed_dim=16):
    torch.manual_seed(0)
    ref = RefADMUNet(
        channels_per_layer=[32, 64],
        num_resize=1,
        num_res_per_layer=1,
        use_attention_for_layer=[False, True],
        dim_res_cond=48,
        dim_attn_cond=48,
        embed_dim=embed_dim,
        time_embed_dim=16,
        in_channels=3,
        out_channels=6,  # reference expects the caller to pre-double for variance
        predict_variance_value=True,
    )
    # give the zero-initialized output conv real weights so parity is not
    # trivially 0 == 0
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.02)
    ref.eval()
    return ref


def test_adm_unet_converted_weight_parity():
    ref = _build_ref()
    model = ADMUNet(
        channels_per_layer=(32, 64),
        num_resize=1,
        num_res_per_layer=1,
        use_attention_for_layer=(False, True),
        dim_res_cond=48,
        dim_attn_cond=48,
        time_embed_dim=16,
        embed_name="context",
        variance_value_transform=lambda v: v,  # reference default is identity
    )
    params = adm_unet_params_from_torch(ref)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    t = np.asarray([3, 999])
    context = rng.randn(2, 16).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.as_tensor(x).permute(0, 3, 1, 2),
            torch.as_tensor(t),
            {"context": torch.as_tensor(context)},
        )
    out = model.apply(
        params, jnp.asarray(x), jnp.asarray(t), {"context": jnp.asarray(context)}
    )

    ref_pred = ref_out.prediction.permute(0, 2, 3, 1).numpy()
    ref_var = ref_out.variance_value.permute(0, 2, 3, 1).numpy()
    assert_expected(np.asarray(out.prediction), ref_pred, rtol=2e-4, atol=2e-5)
    assert_expected(np.asarray(out.variance_value), ref_var, rtol=2e-4, atol=2e-5)


def test_adm_unet_learned_context_tokens():
    """The named context embedding produces exactly 4 learned attention
    tokens (adm.py:183-196); a second non-context 2-d input conditions the
    residual path only."""
    model = ADMUNet(
        channels_per_layer=(32, 64),
        num_resize=1,
        num_res_per_layer=1,
        use_attention_for_layer=(False, True),
        dim_res_cond=48,
        dim_attn_cond=48,
        time_embed_dim=16,
    )
    import jax

    x = jnp.ones((1, 16, 16, 3))
    cond = {"context": jnp.ones((1, 16)), "class_emb": jnp.ones((1, 8))}
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([1]), cond)
    p = params["params"]
    # context: res projection + 4-token attention projection
    assert p["attn_cond_context"]["kernel"].shape == (16, 4 * 48)
    assert p["res_cond_context"]["kernel"].shape == (16, 48)
    # class_emb: residual only
    assert p["res_cond_class_emb"]["kernel"].shape == (8, 48)
    assert "attn_cond_class_emb" not in p
    out = model.apply(params, x, jnp.asarray([1]), cond)
    assert out.prediction.shape == x.shape
