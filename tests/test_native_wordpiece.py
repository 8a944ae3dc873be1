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
    ]
    for t in texts:
        assert nat.encode(t) == py.encode(t), t


def test_native_is_not_slower():
    import random

    random.seed(0)
    words = ["a", "man", "rides", "horses", "unbelievable", "zzz", "the"]
    text = " ".join(random.choice(words) for _ in range(2000))
    py = WordPieceTokenizer(VOCAB)
    nat = NativeWordPieceTokenizer(VOCAB)
    t0 = time.perf_counter(); py.encode(text); t_py = time.perf_counter() - t0
    t0 = time.perf_counter(); nat.encode(text); t_nat = time.perf_counter() - t0
    # sanity only: native shouldn't be drastically slower
    assert t_nat < t_py * 3
