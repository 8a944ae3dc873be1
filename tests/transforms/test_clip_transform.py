"""CLIP tokenizer/transform tests, incl. exact parity vs the reference BPE."""

import os

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")
BPE_PATH = os.path.join(ASSETS, "clip_merges.bpe")

from multimodal_tpu.transforms.clip_transform import (  # noqa: E402
    CLIPBPETokenizer,
    CLIPTextTransform,
    CLIPTransform,
    bytes_to_unicode,
)


def test_bytes_to_unicode_table():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert table[ord("a")] == "a"
    assert list(table.keys())[0] == ord("!")


def test_tokenizer_roundtrip():
    tok = CLIPBPETokenizer(BPE_PATH)
    ids = tok.encode("Hello I am using CLIP tokenizer.")
    assert ids == [3306, 328, 687, 1996, 9289, 32634, 23895, 269]
    assert tok.decode(ids).strip() == "hello i am using clip tokenizer ."
    assert tok.vocab_size == 49408


def test_tokenizer_parity_with_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_compat import import_reference

    import_reference()
    from torchmultimodal.transforms.clip_transform import (
        CLIPBPETokenizer as RefTokenizer,
    )

    # num_merges=48894 matches the reference's own CLIPTextTransform usage;
    # the reference's *default* keeps a stray empty merge from the trailing
    # newline (vocab 49409) which the canonical CLIP tokenizer does not.
    ref = RefTokenizer(bpe_path=BPE_PATH, num_merges=48894)
    mine = CLIPBPETokenizer(BPE_PATH, num_merges=48894)
    prompts = [
        "a photo of a cat",
        "The quick brown fox jumps over 12 lazy dogs!",
        "it's a beautiful day... isn't it?",
        "<|startoftext|>special tokens<|endoftext|>",
        "numbers 1234567890 and sym&ols @#%",
    ]
    for p in prompts:
        assert mine.encode(p) == ref.encode(p), p


def test_text_transform_shapes():
    tt = CLIPTextTransform(BPE_PATH)
    out = tt(["a photo of a cat", "a photo of a dog running very fast"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == 49406  # BOS
    assert 49407 in out[0]  # EOS present
    single = tt("a photo of a cat")
    assert single.shape == (77,)
    np.testing.assert_array_equal(single, out[0])


def test_clip_transform_end_to_end():
    from PIL import Image

    img = Image.open(os.path.join(ASSETS, "test_image.jpg"))
    transform = CLIPTransform(BPE_PATH, is_train=False)
    img_out, txt_out = transform(img, ["a photo of a dog"])
    assert img_out.shape == (1, 224, 224, 3)
    assert txt_out.shape == (1, 77)
    assert abs(float(img_out.mean())) < 2.0


def test_fused_device_pipeline_close_to_pil():
    from PIL import Image

    from multimodal_tpu.ops.image import fused_decode_resize_normalize
    from multimodal_tpu.transforms.clip_transform import CLIPImageTransform

    img = Image.open(os.path.join(ASSETS, "test_image.jpg")).convert("RGB")
    pil_out = CLIPImageTransform(is_train=False)(img)

    arr = np.asarray(img, dtype=np.uint8)[None]
    dev_out = np.asarray(fused_decode_resize_normalize(arr, 224))
    assert dev_out.shape == (1, 224, 224, 3)
    # Keys-cubic vs PIL bicubic: close but not identical
    diff = np.abs(dev_out[0] - pil_out)
    assert float(np.mean(diff)) < 0.08, float(np.mean(diff))
