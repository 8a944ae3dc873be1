"""Native WordPiece kernel == pure-Python tokenizer."""

import time

from multimodal_tpu.examples.mugen.bert_text_transform import WordPieceTokenizer
from multimodal_tpu.native.wordpiece import NativeWordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "man", "rides", "hor",
         "##se", "##s", "un", "##believ", "##able", "!", "the", "q"]


def test_native_matches_python():
    py = WordPieceTokenizer(VOCAB)
    nat = NativeWordPieceTokenizer(VOCAB)
    assert nat._handle is not None, "native lib failed to build"
    texts = [
        "a man rides horses",
        "unbelievable!",
        "the ZZZ man",          # ZZZ -> [UNK]
        "",
        "a" * 150,              # over max_chars_per_word -> [UNK]
        "a man, rides; horses!!",
        "a_man rides\thorses\nagain",
        "unébelievable café",  # non-ASCII -> Python fallback path
    ]
    for t in texts:
        assert nat.encode(t) == py.encode(t), t


def test_native_is_faster():
    import random

    random.seed(0)
    words = ["a", "man", "rides", "horses", "unbelievable", "zzz", "the"]
    text = " ".join(random.choice(words) for _ in range(2000))
    py = WordPieceTokenizer(VOCAB)
    nat = NativeWordPieceTokenizer(VOCAB)
    assert nat.encode(text) == py.encode(text)

    def best_of(fn, n=5):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(text)
            times.append(time.perf_counter() - t0)
        return min(times)

    nat.encode(text)  # warm the ctypes path before timing
    t_py = best_of(py.encode)
    t_nat = best_of(nat.encode)
    # whole-text C++ path must actually beat the pure-Python tokenizer
    assert t_nat < t_py, f"native {t_nat:.5f}s not faster than python {t_py:.5f}s"
