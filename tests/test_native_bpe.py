"""Native C++ BPE: exact parity with the Python tokenizer + speedup check."""

import os
import time

import numpy as np
import pytest

from multimodal_tpu.native.bpe import NativeCLIPBPETokenizer
from multimodal_tpu.transforms.clip_transform import CLIPBPETokenizer

BPE_PATH = os.path.join(os.path.dirname(__file__), "assets", "clip_merges.bpe")

PROMPTS = [
    "a photo of a cat sitting on a windowsill",
    "the quick brown fox jumps over 12 lazy dogs!",
    "it's a beautiful day... isn't it?",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "numbers 1234567890 and sym&ols @#%",
]


@pytest.fixture(scope="module")
def tokenizers():
    native = NativeCLIPBPETokenizer(BPE_PATH, num_merges=48894)
    python = CLIPBPETokenizer(BPE_PATH, num_merges=48894)
    return native, python


def test_native_available_and_exact(tokenizers):
    native, python = tokenizers
    assert native.is_native, "native library failed to build/load"
    for p in PROMPTS:
        assert native.encode(p) == python.encode(p), p


def test_native_exact_on_random_strings(tokenizers):
    native, python = tokenizers
    rng = np.random.RandomState(0)
    words = ["".join(chr(rng.randint(97, 123)) for _ in range(rng.randint(1, 15)))
             for _ in range(200)]
    text = " ".join(words)
    assert native.encode(text) == python.encode(text)


def test_native_speedup(tokenizers):
    native, python = tokenizers
    rng = np.random.RandomState(1)
    # fresh long words defeat both caches
    words = ["".join(chr(rng.randint(97, 123)) for _ in range(12)) for _ in range(2000)]
    text = " ".join(words)

    def fresh_text():
        words = [
            "".join(chr(rng.randint(97, 123)) for _ in range(12))
            for _ in range(2000)
        ]
        return " ".join(words)

    def best_of(fn, n=3):
        # best-of-n on fresh (uncached) words: single-shot timing flakes
        # under box load
        times = []
        for _ in range(n):
            t = fresh_text()
            t0 = time.perf_counter()
            fn(t)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best_of(native.encode)
    t_python = best_of(python.encode)

    assert t_native < t_python, (t_native, t_python)
    print(f"native {t_native*1e3:.1f}ms vs python {t_python*1e3:.1f}ms "
          f"({t_python / t_native:.1f}x)")
