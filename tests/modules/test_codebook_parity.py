"""EMA codebook training-step parity vs the reference Codebook."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from multimodal_tpu.modules.layers.codebook import Codebook

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.modules.layers.codebook import Codebook as TorchCodebook  # noqa: E402


def test_codebook_train_step_parity():
    """Same starting embedding + same batch -> same quantization AND same
    EMA-updated stats (usage decay, Laplace-smoothed code averages). Keep all
    codes above the usage threshold so the randomized dead-code reinit never
    triggers."""
    n, d = 4, 3
    torch.manual_seed(0)
    ref = TorchCodebook(num_embeddings=n, embedding_dim=d,
                        codebook_usage_threshold=0.0).train()
    r = np.random.RandomState(0)
    emb0 = r.randn(n, d).astype(np.float32)
    # seed the reference's lazy init deterministically
    ref.embedding.copy_(torch.as_tensor(emb0))
    ref.code_avg.copy_(torch.as_tensor(emb0))
    ref.code_usage.copy_(torch.ones(n))
    ref._is_embedding_init = True

    model = Codebook(num_embeddings=n, embedding_dim=d,
                     codebook_usage_threshold=0.0)
    variables = {
        "vq_stats": {
            "embedding": jnp.asarray(emb0),
            "code_avg": jnp.asarray(emb0),
            "code_usage": jnp.ones(n),
            "is_init": jnp.array(True),
        }
    }

    z = r.randn(2, 5, d).astype(np.float32)
    with torch.no_grad():
        # reference is channel-first: (b, c, n); ours channel-last (b, n, c)
        want = ref(torch.as_tensor(z).permute(0, 2, 1))
    got, updated = model.apply(
        variables, jnp.asarray(z), deterministic=False,
        mutable=["vq_stats"], rngs={"vq": jax.random.PRNGKey(0)},
    )

    assert (np.asarray(got.codebook_indices).ravel()
            == want.codebook_indices.numpy().ravel()).all()
    np.testing.assert_allclose(
        np.asarray(got.quantized).reshape(-1, d),
        want.quantized.permute(0, 2, 1).reshape(-1, d).numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updated["vq_stats"]["embedding"]),
        ref.embedding.numpy(), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updated["vq_stats"]["code_usage"]),
        ref.code_usage.numpy(), rtol=1e-5, atol=1e-5,
    )
