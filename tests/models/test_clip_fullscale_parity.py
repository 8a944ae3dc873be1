"""Full-scale CLIP ViT-B/32 parity + the pretrained-loading path.

The driver target is literally "CLIP ViT-B/32 zero-shot embedding cosine
>=0.999 vs the PyTorch reference" (BASELINE.json). The toy-config parity
tests can hide converter bugs that only appear at 12 layers / width 768
(head-count-dependent reshapes), so this test runs the REAL B/32 config with
fixed-seed random reference weights through ``clip_params_from_torch`` and
the ``clip_vit_b32(pretrained=...)`` builder path (reference analog:
``tests/models/clip/test_checkpoint.py:55-80`` + ``models/clip/model.py:88``).
"""

import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from multimodal_tpu.models.clip.model import clip_vit_b32

from tests.reference_compat import import_reference

tmm = import_reference()

from torchmultimodal.models.clip.model import clip_vit_b32 as torch_clip_vit_b32  # noqa: E402


def _cosine(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return float(np.min(num / den))


@pytest.mark.slow
def test_clip_vit_b32_fullscale_pretrained_path():
    torch.manual_seed(7)
    ref = torch_clip_vit_b32(pretrained=False).eval()

    # Save the torch checkpoint and load it through the public
    # ``pretrained=`` builder path (local-path analog of the URL map).
    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "clip_vit_b32.pt")
        torch.save(ref.state_dict(), ckpt)
        model, params = clip_vit_b32(pretrained=ckpt)

    img = torch.randn(2, 3, 224, 224)
    ids = torch.randint(1, 49407, (2, 77))
    ids[:, -1] = 49407  # EOT = highest id (argmax pooling)
    with torch.no_grad():
        ref_out = ref(img, ids)

    out = jax.jit(model.apply)(
        params,
        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ids.numpy()),
    )
    cos_img = _cosine(out.embeddings_a, ref_out.embeddings_a.numpy())
    cos_txt = _cosine(out.embeddings_b, ref_out.embeddings_b.numpy())
    assert cos_img >= 0.999, f"image cosine {cos_img}"
    assert cos_txt >= 0.999, f"text cosine {cos_txt}"
    # reference checkpoint-test protocol also asserts the embedding mean
    np.testing.assert_allclose(
        float(np.mean(np.asarray(out.embeddings_a))),
        float(ref_out.embeddings_a.mean()),
        atol=1e-4,
    )


@pytest.mark.slow
def test_clip_vit_b32_url_resolves_via_cache(tmp_path, monkeypatch):
    """pretrained=True resolves the reference URL through the local cache."""
    monkeypatch.setenv("MMTPU_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("MMTPU_ALLOW_DOWNLOAD", raising=False)

    from multimodal_tpu.utils.file_io import _PATH_MANAGER
    from multimodal_tpu.utils.pretrained import CLIP_MODEL_MAPPING

    # cache miss with no egress -> clear error naming the cache path
    with pytest.raises(RuntimeError, match="local cache"):
        clip_vit_b32(pretrained=True)

    # out-of-band population of the cache makes pretrained=True work
    torch.manual_seed(0)
    ref = torch_clip_vit_b32(pretrained=False)
    src = tmp_path / "downloaded.pt"
    torch.save(ref.state_dict(), str(src))
    _PATH_MANAGER.add_to_cache(CLIP_MODEL_MAPPING["vit_b32"], str(src))

    model, params = clip_vit_b32(pretrained=True)
    leaves = jax.tree_util.tree_leaves(params)
    ref_count = sum(p.numel() for p in ref.state_dict().values())
    assert sum(int(np.prod(l.shape)) for l in leaves) == ref_count
