"""MUGEN dataset layer (reference examples/mugen/data/mugen_dataset.py):
metadata JSON + pre-rendered clips -> static video/text batches."""

import json

import numpy as np

from multimodal_tpu.examples.mugen.data import MUGENDataModule


def _toy_tokenize(texts, length=8):
    return np.asarray(
        [[1] + [10 + ord(c) % 50 for c in t[: length - 1]] for t in texts]
    )


def _write_dataset(tmp_path, n=5, frames=40, audio=False, split="train"):
    import wave

    rng = np.random.RandomState(0)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir(exist_ok=True)
    data = []
    for i in range(n):
        num = frames if i else 3  # first clip too short -> filtered
        np.save(frames_dir / f"vid{i}.npy",
                rng.randint(0, 256, (num, 8, 8, 3), dtype=np.uint8))
        if audio:
            # stereo 16-bit PCM wav at 8 kHz (resampled by the loader)
            wav = (rng.randn(8000, 2) * 3000).astype(np.int16)
            with wave.open(str(frames_dir / f"vid{i}.wav"), "wb") as w:
                w.setnchannels(2)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(wav.tobytes())
        data.append({
            "video": {"id": f"vid{i}", "num_frames": num},
            "annotations": [{"text": f"mugen jumps over gap {i}"}],
        })
    with open(tmp_path / f"{split}.json", "w") as f:
        json.dump({"metadata": {"version": "test"}, "data": data}, f)
    return str(tmp_path), str(frames_dir)


def test_mugen_datamodule(tmp_path):
    data_path, frames_dir = _write_dataset(tmp_path)
    dm = MUGENDataModule(
        data_path, frames_dir, text_transform=_toy_tokenize,
        sequence_length=4, sample_every_n_frames=3, text_len=8,
        batch_size=2, prefetch=0, shuffle=False,
    )
    # too-short clip filtered (reference mugen_dataset.py:92-97)
    assert len(dm.dataset) == 4
    batch = next(iter(dm))
    assert batch["video"].shape == (2, 4, 8, 8, 3)
    assert batch["video"].dtype == np.float32
    assert 0.0 <= batch["video"].min() and batch["video"].max() <= 1.0
    assert batch["text"].shape == (2, 8)

    # random start sampling stays in range and is deterministic per seed
    dm2 = MUGENDataModule(
        data_path, frames_dir, text_transform=_toy_tokenize,
        sequence_length=4, sample_every_n_frames=3, fixed_start_idx=False,
        text_len=8, batch_size=2, prefetch=0, seed=3,
    )
    a = next(iter(dm2))["video"]
    b = next(iter(MUGENDataModule(
        data_path, frames_dir, text_transform=_toy_tokenize,
        sequence_length=4, sample_every_n_frames=3, fixed_start_idx=False,
        text_len=8, batch_size=2, prefetch=0, seed=3,
    )))["video"]
    np.testing.assert_array_equal(a, b)


def test_audio_utils_wav_roundtrip(tmp_path):
    """load_audio: PCM wav decode -> float in [-1, 1], resample to 22050 Hz,
    pad/trim to the 3.2 s MUGEN window (reference audio_utils.py semantics)."""
    import wave

    from multimodal_tpu.examples.mugen.audio_utils import (
        AUDIO_SAMPLE_LENGTH,
        AUDIO_SAMPLE_RATE,
        load_audio,
        resample_audio,
    )

    rng = np.random.RandomState(1)
    t = np.arange(4000) / 8000.0
    sig = np.stack([np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 220 * t)], 1)
    path = tmp_path / "a.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())

    out = load_audio(str(path))
    assert out.shape == (AUDIO_SAMPLE_LENGTH, 2)
    assert out.dtype == np.float32
    assert np.abs(out).max() <= 1.0
    # first 0.5 s carries the resampled sine; the padded tail is zeros
    assert np.abs(out[: AUDIO_SAMPLE_RATE // 4]).max() > 0.5
    assert np.abs(out[-100:]).max() == 0.0

    # resampling preserves a pure tone's frequency (spectral peak)
    res = resample_audio(sig.astype(np.float32), 8000, 22050)
    spec = np.abs(np.fft.rfft(res[:, 0]))
    peak_hz = np.argmax(spec) * 22050 / len(res)
    assert abs(peak_hz - 440) < 10

    # .npy path: already at target rate
    np.save(tmp_path / "b.npy", sig.astype(np.float32))
    out2 = load_audio(str(tmp_path / "b.npy"), duration=2000)
    assert out2.shape == (2000, 2)
    np.testing.assert_allclose(out2, sig[:2000], atol=1e-6)


def test_mugen_datamodule_audio_batches(tmp_path):
    """The third modality (reference mugen_dataset.py:226): audio rides the
    batch alongside video/text, optionally through a transform."""
    data_path, frames_dir = _write_dataset(tmp_path, audio=True)
    dm = MUGENDataModule(
        data_path, frames_dir, text_transform=_toy_tokenize,
        sequence_length=4, sample_every_n_frames=3, text_len=8,
        get_audio=True, audio_sample_length=4410,
        batch_size=2, prefetch=0, shuffle=False,
    )
    batch = next(iter(dm))
    assert batch["audio"].shape == (2, 4410, 2)
    assert batch["audio"].dtype == np.float32
    assert set(batch) >= {"video", "text", "audio"}

    # with an fbank transform the batch carries (frames, mel, 1) images
    from multimodal_tpu.transforms.mae_transform import AudioEvalTransform

    fbank = AudioEvalTransform(melbins=16, target_length=32)
    dm2 = MUGENDataModule(
        data_path, frames_dir, sequence_length=4, sample_every_n_frames=3,
        get_audio=True, audio_sample_length=4410,
        audio_transform=lambda a: fbank([a.mean(-1)], sample_rate=22050)[0],
        batch_size=2, prefetch=0, shuffle=False,
    )
    batch2 = next(iter(dm2))
    assert batch2["audio"].shape == (2, 32, 16, 1)
