"""Chat-JSON SFT datasets for WeDetect-Ref training.

Behavioral spec: reference wedetect_ref/sft.py:100-291
(LazySupervisedDataset: JSON list of {image, conversations
[{from: human/gpt, value}]}; '<image>\n' stripped from the human turn;
Qwen chat template; labels mask everything except assistant turns)
and sft_referring.py:219-331 (stage 3; see train/ref_sft.py).

Sequences are built with an injected tokenizer; retry-on-error falls
back to random samples (reference sft.py __getitem__ retry loop).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from wedetect_tpu.train.ref_lm import IGNORE_INDEX


class ChatSftDataset:
    def __init__(self, data_path: str, tokenizer,
                 image_token_id: int, vision_start_token_id: int,
                 max_len: int = 5120, max_retry: int = 5,
                 seed: int = 0):
        with open(data_path) as f:
            self.data = json.load(f)
        self.tok = tokenizer
        self.image_token_id = image_token_id
        self.vision_start_token_id = vision_start_token_id
        self.max_len = max_len
        self.max_retry = max_retry
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.data)

    def _enc(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def build(self, conversations: Sequence[Dict], n_img: int
              ) -> Tuple[np.ndarray, np.ndarray, int]:
        """-> (input_ids, labels, visual_start). Assistant turns
        supervise; user/image tokens are IGNORE_INDEX."""
        ids: List[int] = []
        spans: List[Tuple[int, int]] = []
        visual_start = -1
        for conv in conversations:
            role = conv.get("from", conv.get("role"))
            text = conv["value"] if "value" in conv else conv["content"]
            has_image = "<image>" in text
            text = text.replace("<image>\n", "").replace("<image>", "")
            if role in ("human", "user"):
                ids += self._enc("<|im_start|>user\n")
                if has_image:
                    ids.append(self.vision_start_token_id)
                    visual_start = len(ids)
                    ids += [self.image_token_id] * n_img
                    ids += self._enc("<|vision_end|>")
                ids += self._enc(text)
                ids += self._enc("<|im_end|>\n")
            else:
                ids += self._enc("<|im_start|>assistant\n")
                st = len(ids)
                ids += self._enc(text)
                en = len(ids)
                ids += self._enc("<|im_end|>\n")
                spans.append((st, en + 1))  # supervise through im_end
        arr = np.asarray(ids, np.int32)
        if len(arr) > self.max_len:
            raise ValueError("input too long")
        labels = np.full_like(arr, IGNORE_INDEX)
        for st, en in spans:
            labels[st:min(en, len(arr))] = arr[st:min(en, len(arr))]
        labels[arr == self.image_token_id] = IGNORE_INDEX
        return arr, labels, visual_start

    def sample(self, idx: int) -> Dict:
        for attempt in range(self.max_retry + 1):
            try:
                return self._get(idx)
            except Exception:
                idx = int(self.rng.integers(len(self)))
        raise ValueError("too many bad samples")

    def _get(self, idx: int) -> Dict:
        from wedetect_tpu.data.loader import load_image_rgb
        from wedetect_tpu.data.vision_process import image_to_patches

        src = self.data[idx]
        img = load_image_rgb(src["image"])
        patches, gh, gw = image_to_patches(img)
        n_img = (gh // 2) * (gw // 2)
        ids, labels, visual_start = self.build(src["conversations"],
                                               n_img)
        return {"input_ids": ids, "labels": labels,
                "visual_start": visual_start, "patches": patches,
                "grid": (gh, gw), "image": img}
