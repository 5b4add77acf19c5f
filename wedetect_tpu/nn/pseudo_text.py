"""Precomputed-embedding text backbone.

Behavioral spec: reference
wedetect/models/backbones/mm_backbone.py:540-594
(PseudoLanguageBackbone): text prompts are looked up in a precomputed
{text: embedding} dictionary instead of running a language model —
used to freeze/cache text features at train time.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Sequence

import numpy as np


class PseudoTextBackbone:
    def __init__(self, embedding_path: str = "",
                 table: Dict[str, np.ndarray] = None,
                 normalize: bool = True):
        if table is None:
            with open(embedding_path, "rb") as f:
                table = pickle.load(f)
        self.table = {k: np.asarray(v, np.float32)
                      for k, v in table.items()}
        self.normalize = normalize

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        """(K, C) embeddings for the prompt list."""
        out = np.stack([self.table[t] for t in texts])
        if self.normalize:
            out = out / np.linalg.norm(out, axis=-1, keepdims=True)
        return out
