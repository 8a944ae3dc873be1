"""ALBEF loss parity vs the PyTorch reference (deterministic inputs)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.modules.losses.albef import (
    causal_language_modeling_loss,
    image_text_contrastive_loss,
)

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.modules.losses.albef import (  # noqa: E402
    CausalLanguageModelingLoss,
    ImageTextContrastiveLoss,
)


def test_itc_loss_parity():
    r = np.random.RandomState(0)
    i2t = r.randn(4, 8).astype(np.float32)
    t2i = r.randn(4, 8).astype(np.float32)
    i2t_m = r.randn(4, 8).astype(np.float32)
    t2i_m = r.randn(4, 8).astype(np.float32)
    sim_targets = np.zeros((4, 8), np.float32)
    sim_targets[np.arange(4), np.arange(4)] = 1.0

    ref = ImageTextContrastiveLoss()
    with torch.no_grad():
        # plain, and with momentum distillation at alpha=0.4
        want_plain = float(ref(torch.as_tensor(i2t), torch.as_tensor(t2i),
                               sim_targets=torch.as_tensor(sim_targets)))
        want_dist = float(ref(
            torch.as_tensor(i2t), torch.as_tensor(t2i),
            torch.as_tensor(i2t_m), torch.as_tensor(t2i_m),
            torch.as_tensor(sim_targets), alpha=0.4,
        ))

    got_plain = float(image_text_contrastive_loss(
        jnp.asarray(i2t), jnp.asarray(t2i), sim_targets=jnp.asarray(sim_targets)))
    got_dist = float(image_text_contrastive_loss(
        jnp.asarray(i2t), jnp.asarray(t2i), jnp.asarray(i2t_m),
        jnp.asarray(t2i_m), jnp.asarray(sim_targets), alpha=0.4))
    assert got_plain == pytest.approx(want_plain, rel=1e-5)
    assert got_dist == pytest.approx(want_dist, rel=1e-5)


def test_clm_loss_parity():
    r = np.random.RandomState(1)
    b, s, v = 3, 7, 20
    scores = r.randn(b, s, v).astype(np.float32)
    scores_m = r.randn(b, s, v).astype(np.float32)
    labels = r.randint(0, v, (b, s))
    labels[0, -2:] = -100  # masked positions

    ref = CausalLanguageModelingLoss()
    with torch.no_grad():
        want = ref(torch.as_tensor(labels), torch.as_tensor(scores),
                   torch.as_tensor(scores_m), alpha=0.3).numpy()
    got = np.asarray(causal_language_modeling_loss(
        jnp.asarray(labels), jnp.asarray(scores), jnp.asarray(scores_m), alpha=0.3))
    assert want.shape == got.shape  # per-sample losses
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
