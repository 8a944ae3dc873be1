"""Text sequence primitives.

Parity with reference ``transforms/text_transforms.py`` (Truncate:14,
AddToken:35, PadTransform:58, ToTensor:86): simple callables over
token-id lists producing padded numpy int32 batches (host-side; the
device work starts after tokenization).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

TokenList = List[int]


class Truncate:
    def __init__(self, max_seq_len: int):
        self.max_seq_len = max_seq_len

    def __call__(self, tokens: Union[TokenList, List[TokenList]]):
        if tokens and isinstance(tokens[0], list):
            return [t[: self.max_seq_len] for t in tokens]
        return tokens[: self.max_seq_len]


class AddToken:
    def __init__(self, token: int, begin: bool = True):
        self.token = token
        self.begin = begin

    def _one(self, t: TokenList) -> TokenList:
        return [self.token] + t if self.begin else t + [self.token]

    def __call__(self, tokens: Union[TokenList, List[TokenList]]):
        if tokens and isinstance(tokens[0], list):
            return [self._one(t) for t in tokens]
        return self._one(tokens)


class ToTensor:
    """Pad ragged lists of token ids into a (batch, max_len) int32 array."""

    def __init__(self, padding_value: int = 0, dtype=np.int32):
        self.padding_value = padding_value
        self.dtype = dtype

    def __call__(self, tokens: Union[TokenList, List[TokenList]]) -> np.ndarray:
        if not tokens or not isinstance(tokens[0], list):
            return np.asarray(tokens, dtype=self.dtype)
        max_len = max(len(t) for t in tokens)
        out = np.full((len(tokens), max_len), self.padding_value, dtype=self.dtype)
        for i, t in enumerate(tokens):
            out[i, : len(t)] = t
        return out


class PadTransform:
    """Pad the last dim of an int array to ``max_length`` with ``pad_value``."""

    def __init__(self, max_length: int, pad_value: int = 0):
        self.max_length = max_length
        self.pad_value = pad_value

    def __call__(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        cur = x.shape[-1]
        if cur >= self.max_length:
            return x[..., : self.max_length]
        pad = [(0, 0)] * (x.ndim - 1) + [(0, self.max_length - cur)]
        return np.pad(x, pad, constant_values=self.pad_value)
