"""Chat SFT sequence building tests."""

import json

import numpy as np
import pytest

from wedetect_tpu.data.sft_chat import ChatSftDataset
from wedetect_tpu.train.ref_lm import IGNORE_INDEX


class FakeTok:
    def encode(self, text, add_special_tokens=False):
        return [(ord(c) % 50) + 200 for c in text][:8]


@pytest.fixture
def ds(tmp_path):
    data = [{"image": "x.jpg", "conversations": [
        {"from": "human", "value": "<image>\ndescribe"},
        {"from": "gpt", "value": "a dog"},
    ]}]
    p = tmp_path / "chat.json"
    p.write_text(json.dumps(data))
    return ChatSftDataset(str(p), FakeTok(), image_token_id=120,
                          vision_start_token_id=122)


def test_build(ds):
    ids, labels, vs = ds.build(ds.data[0]["conversations"], n_img=6)
    assert (ids == 120).sum() == 6
    assert ids[vs] == 120 and ids[vs - 1] == 122
    # image + user tokens unsupervised
    assert (labels[ids == 120] == IGNORE_INDEX).all()
    sup = labels != IGNORE_INDEX
    assert sup.sum() > 0
    # supervised tokens are within the assistant turn
    assert (labels[sup] == ids[sup]).all()


def test_too_long(tmp_path):
    data = [{"image": "x.jpg", "conversations": [
        {"from": "human", "value": "hi"},
        {"from": "gpt", "value": "y" * 100},
    ]}]
    p = tmp_path / "c.json"
    p.write_text(json.dumps(data))
    ds = ChatSftDataset(str(p), FakeTok(), 120, 122, max_len=5)
    with pytest.raises(ValueError):
        ds.build(ds.data[0]["conversations"], n_img=2)
