"""FLAVA / MAE / video transform tests."""

import os

import jax.numpy as jnp
import numpy as np

from multimodal_tpu.transforms.flava_transform import (
    FLAVAImageTransform,
    ImageMaskingGenerator,
    map_pixels,
)
from multimodal_tpu.transforms.mae_transform import (
    AudioEvalTransform,
    AudioFineTuneTransform,
    AudioPretrainTransform,
    ImageEvalTransform,
    ImagePretrainTransform,
    MixUpCutMix,
    get_fbank,
    roll_mag_aug,
)
from multimodal_tpu.transforms.video_transform import VideoTransform

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def _test_image():
    from PIL import Image

    return Image.open(os.path.join(ASSETS, "test_image.jpg"))


def test_flava_image_transform():
    t = FLAVAImageTransform(is_train=False, rng=np.random.RandomState(0))
    out = t(_test_image())
    assert out["image"].shape == (1, 224, 224, 3)
    assert out["image_for_codebook"].shape == (1, 112, 112, 3)
    assert out["image_patches_mask"].shape == (1, 14, 14)
    # logit-laplace mapping keeps values in [eps, 1-eps]
    cb = out["image_for_codebook"]
    assert cb.min() >= 0.1 - 1e-6 and cb.max() <= 0.9 + 1e-6
    # ~75 patches masked by default (generator may stop just short when no
    # non-overlapping rectangle fits, matching reference behavior)
    assert 60 <= int(out["image_patches_mask"].sum()) <= 75

    t_train = FLAVAImageTransform(is_train=True, rng=np.random.RandomState(1))
    out2 = t_train([_test_image(), _test_image()])
    assert out2["image"].shape == (2, 224, 224, 3)


def test_masking_generator_counts():
    gen = ImageMaskingGenerator(14, num_masking_patches=75, min_num_patches=16)
    for _ in range(3):
        mask = gen()
        assert mask.shape == (14, 14)
        assert mask.sum() >= 60  # close to target (may stop early)


def test_mae_image_transforms():
    img = _test_image()
    eval_out = ImageEvalTransform(64)(img)
    assert eval_out.shape == (1, 64, 64, 3)
    train_out = ImagePretrainTransform(64, rng=np.random.RandomState(0))([img, img])
    assert train_out.shape == (2, 64, 64, 3)


def test_mixup_cutmix():
    rng = np.random.RandomState(0)
    images = rng.rand(4, 16, 16, 3).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    mix = MixUpCutMix(num_classes=5, rng=np.random.RandomState(1))
    mixed, y = mix(images, labels)
    assert mixed.shape == images.shape
    assert y.shape == (4, 5)
    np.testing.assert_allclose(y.sum(1), np.ones(4), rtol=1e-5)


def test_audio_fbank_pipeline():
    sr = 16000
    tsec = 0.5
    t = np.linspace(0, tsec, int(sr * tsec), endpoint=False)
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)

    fb = get_fbank(wav, sr, num_mel_bins=64)
    assert fb.shape[1] == 64
    assert fb.shape[0] > 10
    # 440Hz tone peaks in a consistent low-mel band
    peak_bin = int(np.argmax(fb.mean(0)))
    assert 0 < peak_bin < 32

    out = AudioEvalTransform(melbins=64, target_length=128)(wav)
    assert out.shape == (1, 128, 64, 1)
    out2 = AudioPretrainTransform(melbins=64, target_length=128,
                                  rng=np.random.RandomState(0))(wav)
    assert out2.shape == (1, 128, 64, 1)
    out3 = AudioFineTuneTransform(melbins=64, target_length=128, freq_mask=8,
                                  time_mask=16, rng=np.random.RandomState(1))(wav)
    assert out3.shape == (1, 128, 64, 1)

    rolled = roll_mag_aug(wav, np.random.RandomState(2))
    assert rolled.shape == wav.shape


def test_video_transform():
    video = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (2, 7, 32, 32, 3), dtype=np.uint8)
    )
    out = VideoTransform(time_samples=8, resize_shape=(16, 16))(video)
    assert out.shape == (2, 8, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_text_transform_primitives():
    from multimodal_tpu.transforms.text_transforms import (
        AddToken,
        PadTransform,
        ToTensor,
        Truncate,
    )

    toks = [[1, 2, 3, 4, 5], [6, 7]]
    assert Truncate(3)(toks) == [[1, 2, 3], [6, 7]]
    assert AddToken(0, begin=True)(toks) == [[0, 1, 2, 3, 4, 5], [0, 6, 7]]
    assert AddToken(9, begin=False)([1, 2]) == [1, 2, 9]

    arr = ToTensor(padding_value=-1)(toks)
    assert arr.shape == (2, 5) and arr[1, 2] == -1 and arr.dtype == np.int32

    padded = PadTransform(4, pad_value=7)(np.array([[1, 2]]))
    assert padded.tolist() == [[1, 2, 7, 7]]
    truncated = PadTransform(2)(np.array([[1, 2, 3]]))
    assert truncated.tolist() == [[1, 2]]
