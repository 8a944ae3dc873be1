"""Native JPEG decode stage: correctness vs PIL and throughput report."""

import io
import time

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from multimodal_tpu.native.jpeg import (  # noqa: E402
    decode_jpeg_batch,
    native_jpeg_available,
)


def _make_jpegs(n, sizes, quality=90, seed=0):
    rng = np.random.RandomState(seed)
    blobs = []
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        # smooth-ish content so JPEG artifacts stay small
        base = rng.rand(8, 8, 3)
        arr = np.asarray(
            Image.fromarray((base * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR)
        )
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
        blobs.append(buf.getvalue())
    return blobs


def test_native_jpeg_builds():
    assert native_jpeg_available(), "libjpeg decode kernel failed to build"


def test_decode_matches_pil_closely():
    blobs = _make_jpegs(6, [(480, 640), (300, 300), (1024, 768)])
    got = decode_jpeg_batch(blobs, 256, 256)
    assert got.shape == (6, 256, 256, 3) and got.dtype == np.uint8

    for i, blob in enumerate(blobs):
        with Image.open(io.BytesIO(blob)) as im:
            want = np.asarray(
                im.convert("RGB").resize((256, 256), Image.BILINEAR), dtype=np.float32
            )
        diff = np.abs(got[i].astype(np.float32) - want)
        # different resample filters (box/area vs bilinear) + DCT-domain
        # scaling: images must agree closely on smooth content
        assert diff.mean() < 4.0, f"image {i}: mean abs diff {diff.mean():.2f}"


def test_decode_grayscale_and_upscale():
    # grayscale source, and a source smaller than the staging shape
    img = (np.random.RandomState(1).rand(64, 48) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=95)
    out = decode_jpeg_batch([buf.getvalue()], 128, 128)
    assert out.shape == (1, 128, 128, 3)
    # RGB channels equal for a grayscale source
    np.testing.assert_array_equal(out[0, :, :, 0], out[0, :, :, 1])


def test_decode_throughput_report():
    """Not an assertion — prints images/sec for the native vs PIL path."""
    if not native_jpeg_available():
        pytest.skip("native lib unavailable")
    blobs = _make_jpegs(32, [(1536, 2048)])

    t0 = time.perf_counter()
    decode_jpeg_batch(blobs, 256, 256)
    t_native = time.perf_counter() - t0

    from multimodal_tpu.native.jpeg import _decode_pil

    t0 = time.perf_counter()
    _decode_pil(blobs, 256, 256)
    t_pil = time.perf_counter() - t0

    print(
        f"\nnative decode: {len(blobs) / t_native:.0f} img/s, "
        f"PIL: {len(blobs) / t_pil:.0f} img/s ({t_pil / t_native:.1f}x)"
    )


def test_decode_multithreaded_matches_single():
    if not native_jpeg_available():
        pytest.skip("native lib unavailable")
    blobs = _make_jpegs(8, [(480, 640), (256, 256)], seed=5)
    single = decode_jpeg_batch(blobs, 224, 224, n_threads=1)
    multi = decode_jpeg_batch(blobs, 224, 224, n_threads=4)
    np.testing.assert_array_equal(single, multi)
