"""CLIP ViT-B/32 parity vs the REAL HuggingFace CLIPModel (the default
CLIPConfig IS ViT-B/32: 12L/768/patch-32 vision + 12L/512 text, quick-gelu,
eos 49407) — proves real openai/clip-vit-base-patch32 Hub checkpoints load
into the framework via `hf_clip_params_from_torch`."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.models.clip.model import clip_vit_b32  # noqa: E402
from multimodal_tpu.utils.checkpoint import hf_clip_params_from_torch  # noqa: E402


def _cosine_rows(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return float(np.min(num / den))


@pytest.mark.slow
def test_clip_vit_b32_matches_real_hf_clip():
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(2)
    ref = CLIPModel(CLIPConfig()).eval()
    variables = hf_clip_params_from_torch(ref.state_dict())
    model = clip_vit_b32()

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 224, 224).astype(np.float32)
    ids = rng.randint(1, 49406, (2, 77)).astype(np.int64)
    ids[:, -1] = 49407  # EOS = highest id (argmax pooling on our side)

    with torch.no_grad():
        want_img = ref.get_image_features(pixel_values=torch.as_tensor(img)).numpy()
        want_txt = ref.get_text_features(input_ids=torch.as_tensor(ids)).numpy()

    out = jax.jit(model.apply)(
        variables,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(ids.astype(np.int32)),
    )
    # ours returns L2-normalized embeddings; HF returns raw projections
    cos_img = _cosine_rows(np.asarray(out.embeddings_a), want_img)
    cos_txt = _cosine_rows(np.asarray(out.embeddings_b), want_txt)
    assert cos_img >= 0.999, f"image cosine {cos_img}"
    assert cos_txt >= 0.999, f"text cosine {cos_txt}"


@pytest.mark.slow
def test_pretrained_builder_autodetects_hf_checkpoint(tmp_path):
    """`clip_vit_b32(pretrained=<path>)` detects an HF CLIPModel state dict
    and converts it automatically."""
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(3)
    ref = CLIPModel(CLIPConfig()).eval()
    path = tmp_path / "hf_clip.pt"
    torch.save(ref.state_dict(), str(path))

    model, variables = clip_vit_b32(pretrained=str(path))

    rng = np.random.RandomState(1)
    img = rng.randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = ref.get_image_features(pixel_values=torch.as_tensor(img)).numpy()
    got = model.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=model.encode_image,
    )
    assert _cosine_rows(np.asarray(got), want) >= 0.999
