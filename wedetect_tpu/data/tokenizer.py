"""Host-side tokenization for the XLM-RoBERTa text tower.

Behavioral spec: reference mm_backbone.py:378-383 (batched HF tokenizer
with padding). The sentencepiece blobs are NOT shipped with the
reference (.MISSING_LARGE_BLOBS); pass a local path or HF name via
`model_name` (default tries the standard hub name and falls back to a
clear error).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


class TextTokenizer:
    def __init__(self, model_name: str = "xlm-roberta-base"):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(model_name)

    def __call__(self, texts: Sequence[str],
                 max_len: int = 64) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (input_ids, attention_mask) int32 (N, L) padded."""
        enc = self.tok(list(texts), padding=True, truncation=True,
                       max_length=max_len, return_tensors="np")
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(np.int32))
