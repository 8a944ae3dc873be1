"""CLIP transforms: byte-level BPE tokenizer + image preprocessing.

Parity with reference ``transforms/clip_transform.py`` (CLIPBPETokenizer:83,
CLIPBPETransform:202, CLIPTextTransform:242, CLIPImageTransform:301,
CLIPTransform:355). The tokenizer is host-side Python (cacheable, tiny);
image preprocessing has two paths:

  - a PIL path bit-matching torchvision's Resize/CenterCrop semantics for
    checkpoint-parity evaluation, and
  - the TPU-native fused on-device path (``multimodal_tpu.ops.image``):
    jitted uint8 -> resize(bicubic) -> center-crop -> normalize, batched —
    the north-star preprocessing pipeline (BASELINE.json).

ftfy is unavailable in this image; ``basic_clean`` falls back to NFC
normalization + html unescape (exact for ASCII prompts).
"""

from __future__ import annotations

import functools
import html
import unicodedata
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

try:
    import regex as re
except ImportError:  # pragma: no cover
    import re  # type: ignore

try:
    import ftfy

    _HAS_FTFY = True
except ImportError:  # pragma: no cover
    _HAS_FTFY = False

from multimodal_tpu.transforms import text_transforms

CLIP_DEFAULT_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_DEFAULT_STD = (0.26862954, 0.26130258, 0.27577711)

_TOKEN_PATTERN = (
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
)


@functools.lru_cache()
def bytes_to_unicode() -> dict:
    """GPT-2 reversible byte <-> printable-unicode table."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    # Insertion order (printables first) determines vocab indices — must
    # match the canonical GPT-2/CLIP table for checkpoint parity.
    ordered = {b: chr(b) for b in printable}
    extra = 0
    for b in range(256):
        if b not in ordered:
            ordered[b] = chr(256 + extra)
            extra += 1
    return ordered


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    else:
        text = unicodedata.normalize("NFC", text)
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPBPETokenizer:
    """Byte-level BPE with CLIP's vocab layout.

    Vocab index order (must match the reference for checkpoint parity):
    256 byte symbols, 256 byte symbols + ``</w>``, merge results, then
    ``bos``/``eos`` special tokens.
    """

    def __init__(
        self,
        bpe_path: str,
        bos_token: str = "<|startoftext|>",
        eos_token: str = "<|endoftext|>",
        num_merges: Optional[int] = None,
    ):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with open(bpe_path, "r", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")[1:]
        if num_merges is not None:
            merge_lines = merge_lines[:num_merges]
        merges = [tuple(line.split()) for line in merge_lines if line.strip()]
        self.num_merges = len(merges)
        self.bpe_ranks = {pair: rank for rank, pair in enumerate(merges)}

        base = list(self.byte_encoder.values())
        vocab = base + [s + "</w>" for s in base]
        vocab += ["".join(pair) for pair in merges]
        vocab += [bos_token, eos_token]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bos_token = bos_token
        self.eos_token = eos_token
        self._cache = {bos_token: bos_token, eos_token: eos_token}
        self.pat = re.compile(_TOKEN_PATTERN, re.IGNORECASE)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _merge_word(self, token: str) -> str:
        """Apply BPE merges to one pre-token; returns space-joined symbols."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        symbols = list(token[:-1]) + [token[-1] + "</w>"]
        while len(symbols) > 1:
            # find the lowest-rank adjacent pair
            best_rank = None
            best_i = -1
            for i in range(len(symbols) - 1):
                r = self.bpe_ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            first, second = symbols[best_i], symbols[best_i + 1]
            # merge every occurrence of this pair in one pass
            merged: List[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == first
                    and symbols[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged
        result = " ".join(symbols)
        self._cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = text.lower().strip()
        for token in re.findall(self.pat, text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[s] for s in self._merge_word(mapped).split(" "))
        return ids

    def decode(self, tokens: Sequence[int]) -> str:
        text = "".join(self.decoder[t] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


class CLIPBPETransform:
    """String(s) -> token id list(s)."""

    def __init__(
        self,
        bpe_path: str,
        bos_token: str = "<|startoftext|>",
        eos_token: str = "<|endoftext|>",
        num_merges: Optional[int] = None,
    ):
        self.bpe = CLIPBPETokenizer(bpe_path, bos_token, eos_token, num_merges)

    def __call__(self, text: Union[str, List[str]]):
        if isinstance(text, str):
            return self.bpe.encode(text)
        return [self.bpe.encode(t) for t in text]


class CLIPTextTransform:
    """Tokenize -> truncate(75) -> +BOS/EOS -> pad to 77.

    Parity: reference ``clip_transform.py:242-298``.
    """

    def __init__(
        self,
        bpe_merges_path: str,
        text_max_length: int = 77,
        text_start_token: str = "<|startoftext|>",
        text_end_token: str = "<|endoftext|>",
        num_merges: Optional[int] = 48894,
    ):
        self.tokenizer = CLIPBPETransform(
            bpe_merges_path, text_start_token, text_end_token, num_merges
        )
        bos_id = self.tokenizer([text_start_token])[0][0]
        eos_id = self.tokenizer([text_end_token])[0][0]
        self.truncate = text_transforms.Truncate(text_max_length - 2)
        self.add_bos = text_transforms.AddToken(bos_id, begin=True)
        self.add_eos = text_transforms.AddToken(eos_id, begin=False)
        self.to_tensor = text_transforms.ToTensor(padding_value=0)
        self.pad = text_transforms.PadTransform(max_length=text_max_length, pad_value=0)

    def __call__(self, text: Union[str, List[str]]) -> np.ndarray:
        single = isinstance(text, str)
        tokens = self.tokenizer([text] if single else text)
        tokens = self.add_eos(self.add_bos(self.truncate(tokens)))
        out = self.pad(self.to_tensor(tokens))
        return out[0] if single else out


def _pil_resize_center_crop(img, size: int):
    """torchvision-equivalent Resize(size, bicubic) + CenterCrop(size)."""
    from PIL import Image

    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = size
    new_long = int(round(size * long / short))
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - size) // 2
    top = (new_h - size) // 2
    return img.crop((left, top, left + size, top + size))


class CLIPImageTransform:
    """Image -> normalized float32 NHWC array.

    Eval: Resize(bicubic, short side) + CenterCrop; train: RandomResizedCrop.
    Parity: reference ``clip_transform.py:301-352``.
    """

    def __init__(
        self,
        image_size: int = 224,
        image_interpolation: str = "bicubic",
        image_mean: Tuple[float, ...] = CLIP_DEFAULT_MEAN,
        image_std: Tuple[float, ...] = CLIP_DEFAULT_STD,
        is_train: bool = True,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.image_size = image_size
        self.mean = np.asarray(image_mean, dtype=np.float32)
        self.std = np.asarray(image_std, dtype=np.float32)
        self.is_train = is_train
        self.rng = rng or np.random.RandomState()

    def _random_resized_crop(self, img):
        from PIL import Image

        w, h = img.size
        area = w * h
        size = self.image_size
        for _ in range(10):
            target_area = area * self.rng.uniform(0.08, 1.0)
            aspect = np.exp(self.rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = self.rng.randint(0, w - cw + 1)
                top = self.rng.randint(0, h - ch + 1)
                return img.resize(
                    (size, size), Image.BICUBIC, box=(left, top, left + cw, top + ch)
                )
        return _pil_resize_center_crop(img, size)

    def __call__(self, image) -> np.ndarray:
        from PIL import Image

        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        image = image.convert("RGB")
        if self.is_train:
            image = self._random_resized_crop(image)
        else:
            image = _pil_resize_center_crop(image, self.image_size)
        arr = np.asarray(image, dtype=np.float32) / 255.0
        return (arr - self.mean) / self.std


class CLIPTransform:
    """Joint (image, text) transform. Parity: reference clip_transform.py:355."""

    def __init__(
        self,
        bpe_merges_path: str,
        image_size: int = 224,
        image_interpolation: str = "bicubic",
        image_mean: Tuple[float, ...] = CLIP_DEFAULT_MEAN,
        image_std: Tuple[float, ...] = CLIP_DEFAULT_STD,
        text_max_length: int = 77,
        is_train: bool = True,
        num_merges: Optional[int] = 48894,
    ):
        self.image_transform = CLIPImageTransform(
            image_size, image_interpolation, image_mean, image_std, is_train
        )
        self.text_transform = CLIPTextTransform(
            bpe_merges_path, text_max_length=text_max_length, num_merges=num_merges
        )

    def __call__(self, image, text) -> Tuple[np.ndarray, np.ndarray]:
        images = image if isinstance(image, (list, tuple)) else [image]
        img_out = np.stack([self.image_transform(im) for im in images])
        txt_out = self.text_transform(text if isinstance(text, list) else [text])
        return img_out, txt_out
