"""MAE / AudioMAE data transforms (host-side numpy).

Parity with reference ``transforms/mae_transform.py`` (ImageEvalTransform:36,
ImagePretrainTransform:83, MixUpCutMix:129, RandAug:238, audio
get_waveform:429, roll_mag_aug:448, get_fbank:466, AudioEvalTransform:526,
AudioPretrainTransform:581, AudioFineTuneTransform:640).

Audio fbanks are computed with a numpy Kaldi-style log-mel pipeline
(povey window, mel filterbank) instead of torchaudio's C++ kaldi op.
Outputs are NHWC float32 arrays.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
AUDIO_MEAN = -4.2677393
AUDIO_STD = 4.5689974


def _resize_center_crop(img, size: int):
    from PIL import Image

    w, h = img.size
    short = min(w, h)
    nw, nh = round(w * size / short), round(h * size / short)
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - size) // 2, (nh - size) // 2
    return img.crop((left, top, left + size, top + size))


class ImageEvalTransform:
    """Resize + center crop + normalize (reference :36)."""

    def __init__(
        self,
        input_size: int = 224,
        mean: Sequence[float] = IMAGENET_DEFAULT_MEAN,
        std: Sequence[float] = IMAGENET_DEFAULT_STD,
    ):
        self.input_size = input_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, images):
        if not isinstance(images, (list, tuple)):
            images = [images]
        out = []
        for img in images:
            img = _resize_center_crop(img.convert("RGB"), self.input_size)
            arr = np.asarray(img, np.float32) / 255.0
            out.append((arr - self.mean) / self.std)
        return np.stack(out)


class ImagePretrainTransform:
    """RandomResizedCrop + horizontal flip + normalize (reference :83)."""

    def __init__(
        self,
        input_size: int = 224,
        scale: Tuple[float, float] = (0.2, 1.0),
        mean: Sequence[float] = IMAGENET_DEFAULT_MEAN,
        std: Sequence[float] = IMAGENET_DEFAULT_STD,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.input_size = input_size
        self.scale = scale
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.rng = rng or np.random.RandomState()

    def _rrc(self, img):
        from PIL import Image

        w, h = img.size
        area = w * h
        for _ in range(10):
            target = area * self.rng.uniform(*self.scale)
            aspect = math.exp(self.rng.uniform(math.log(3 / 4), math.log(4 / 3)))
            cw, ch = int(round(math.sqrt(target * aspect))), int(round(math.sqrt(target / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = self.rng.randint(0, w - cw + 1)
                top = self.rng.randint(0, h - ch + 1)
                return img.resize((self.input_size,) * 2, Image.BICUBIC,
                                  box=(left, top, left + cw, top + ch))
        return _resize_center_crop(img, self.input_size)

    def __call__(self, images):
        if not isinstance(images, (list, tuple)):
            images = [images]
        out = []
        for img in images:
            img = self._rrc(img.convert("RGB"))
            arr = np.asarray(img, np.float32) / 255.0
            if self.rng.rand() < 0.5:
                arr = arr[:, ::-1]
            out.append((arr - self.mean) / self.std)
        return np.stack(out)


class MixUpCutMix:
    """Batch-level mixup/cutmix with label smoothing (reference :129)."""

    def __init__(
        self,
        augment_prob: float = 1.0,
        mixup_alpha: float = 0.8,
        cutmix_alpha: float = 1.0,
        switch_prob: float = 0.5,
        num_classes: int = 1000,
        label_smoothing: float = 0.1,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.augment_prob = augment_prob
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.switch_prob = switch_prob
        self.num_classes = num_classes
        self.label_smoothing = label_smoothing
        self.rng = rng or np.random.RandomState()

    def _one_hot(self, labels, lam_on, lam_off):
        off = self.label_smoothing / self.num_classes
        on = 1.0 - self.label_smoothing + off
        y = np.full((len(labels), self.num_classes), off, np.float32)
        y[np.arange(len(labels)), labels] = on
        return y

    def __call__(self, images: np.ndarray, labels: np.ndarray):
        """images: (b, h, w, c); labels: (b,) int. Mixes with the flipped batch."""
        y = self._one_hot(labels, None, None)
        if self.rng.rand() >= self.augment_prob:
            return images, y
        use_cutmix = self.rng.rand() < self.switch_prob
        if use_cutmix:
            lam = self.rng.beta(self.cutmix_alpha, self.cutmix_alpha)
            h, w = images.shape[1:3]
            cut = math.sqrt(1 - lam)
            ch, cw = int(h * cut), int(w * cut)
            cy, cx = self.rng.randint(h), self.rng.randint(w)
            y1, y2 = np.clip(cy - ch // 2, 0, h), np.clip(cy + ch // 2, 0, h)
            x1, x2 = np.clip(cx - cw // 2, 0, w), np.clip(cx + cw // 2, 0, w)
            mixed = images.copy()
            mixed[:, y1:y2, x1:x2] = images[::-1, y1:y2, x1:x2]
            lam = 1 - (y2 - y1) * (x2 - x1) / (h * w)
        else:
            lam = self.rng.beta(self.mixup_alpha, self.mixup_alpha)
            mixed = lam * images + (1 - lam) * images[::-1]
        y_mixed = lam * y + (1 - lam) * y[::-1]
        return mixed.astype(np.float32), y_mixed


def roll_mag_aug(waveform: np.ndarray, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Random circular shift + magnitude scaling (reference :448)."""
    rng = rng or np.random.RandomState()
    idx = rng.randint(len(waveform))
    rolled = np.roll(waveform, idx)
    mag = rng.beta(10, 10) + 0.5
    return (mag * rolled).astype(np.float32)


def get_fbank(
    waveform: np.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 128,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
) -> np.ndarray:
    """Kaldi-style log-mel filterbanks (reference :466 semantics).

    Returns (num_frames, num_mel_bins) float32.
    """
    waveform = waveform.astype(np.float32)
    waveform = waveform - waveform.mean()
    flen = int(sample_rate * frame_length_ms / 1000)
    fshift = int(sample_rate * frame_shift_ms / 1000)
    nfft = 1 << (flen - 1).bit_length()
    num_frames = max(0, 1 + (len(waveform) - flen) // fshift)
    if num_frames == 0:
        return np.zeros((0, num_mel_bins), np.float32)
    idx = np.arange(flen)[None, :] + fshift * np.arange(num_frames)[:, None]
    frames = waveform[idx]
    # povey window
    n = np.arange(flen)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (flen - 1))) ** 0.85
    frames = frames * window
    spec = np.abs(np.fft.rfft(frames, nfft)) ** 2

    # mel filterbank (kaldi: low 20 Hz, high nyquist)
    def hz2mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (np.exp(m / 1127.0) - 1.0)

    low, high = hz2mel(20.0), hz2mel(sample_rate / 2)
    mel_pts = np.linspace(low, high, num_mel_bins + 2)
    hz_pts = mel2hz(mel_pts)
    bins = np.floor((nfft + 1) * hz_pts / sample_rate).astype(int)
    fb = np.zeros((num_mel_bins, nfft // 2 + 1), np.float32)
    for m in range(1, num_mel_bins + 1):
        l, c, r = bins[m - 1], bins[m], bins[m + 1]
        for k in range(l, c):
            if c > l:
                fb[m - 1, k] = (k - l) / (c - l)
        for k in range(c, r):
            if r > c:
                fb[m - 1, k] = (r - k) / (r - c)
    mel = spec @ fb.T
    return np.log(np.maximum(mel, 1e-10)).astype(np.float32)


def _pad_or_trim_fbank(fbank: np.ndarray, target_len: int) -> np.ndarray:
    n = fbank.shape[0]
    if n < target_len:
        return np.pad(fbank, ((0, target_len - n), (0, 0)))
    return fbank[:target_len]


class AudioEvalTransform:
    """fbank + pad/trim + normalize (reference :526)."""

    def __init__(self, melbins: int = 128, target_length: int = 1024,
                 mean: float = AUDIO_MEAN, std: float = AUDIO_STD):
        self.melbins = melbins
        self.target_length = target_length
        self.mean = mean
        self.std = std

    def __call__(self, waveforms, sample_rate: int = 16000):
        if not isinstance(waveforms, (list, tuple)):
            waveforms = [waveforms]
        out = []
        for wav in waveforms:
            fb = get_fbank(np.asarray(wav), sample_rate, self.melbins)
            fb = _pad_or_trim_fbank(fb, self.target_length)
            fb = (fb - self.mean) / (2 * self.std)
            out.append(fb[..., None])  # (t, mel, 1) NHWC
        return np.stack(out).astype(np.float32)


class AudioPretrainTransform(AudioEvalTransform):
    """fbank + roll/magnitude augmentation (reference :581)."""

    def __init__(self, *args, roll_mag: bool = True,
                 rng: Optional[np.random.RandomState] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.roll_mag = roll_mag
        self.rng = rng or np.random.RandomState()

    def __call__(self, waveforms, sample_rate: int = 16000):
        if not isinstance(waveforms, (list, tuple)):
            waveforms = [waveforms]
        if self.roll_mag:
            waveforms = [roll_mag_aug(np.asarray(w), self.rng) for w in waveforms]
        return super().__call__(waveforms, sample_rate)


class AudioFineTuneTransform(AudioEvalTransform):
    """fbank + freq/time masking noise augmentation (reference :640)."""

    def __init__(self, *args, freq_mask: int = 48, time_mask: int = 192,
                 noise: bool = True, rng: Optional[np.random.RandomState] = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.freq_mask = freq_mask
        self.time_mask = time_mask
        self.noise = noise
        self.rng = rng or np.random.RandomState()

    def __call__(self, waveforms, sample_rate: int = 16000):
        batch = super().__call__(waveforms, sample_rate)
        out = []
        for fb in batch:
            fb = fb.copy()
            t, m, _ = fb.shape
            if self.freq_mask > 0:
                f0 = self.rng.randint(0, m - self.freq_mask) if m > self.freq_mask else 0
                fw = self.rng.randint(0, self.freq_mask + 1)
                fb[:, f0 : f0 + fw] = 0
            if self.time_mask > 0:
                t0 = self.rng.randint(0, t - self.time_mask) if t > self.time_mask else 0
                tw = self.rng.randint(0, self.time_mask + 1)
                fb[t0 : t0 + tw] = 0
            if self.noise:
                fb = fb + self.rng.rand(*fb.shape).astype(np.float32) * (
                    self.rng.rand() + 0.3
                ) * 1e-2
                fb = np.roll(fb, self.rng.randint(-10, 10), axis=0)
            out.append(fb)
        return np.stack(out).astype(np.float32)
