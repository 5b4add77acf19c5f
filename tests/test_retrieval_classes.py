"""Canonical retrieval class tables (data/retrieval_classes.json).

Oracle: the table DEFINITIONS in the reference —
eval_retrieval/extract_embedding.py:1324-1587 ``ds_collections``: 80
COCO / 1203 LVIS categories, paired zh/en names, scored in Chinese
(extract_embedding.py:1706-1713). Spot anchors pin category order.
"""

import numpy as np
import pytest

from wedetect_tpu.data.retrieval_classes import (CLASS_SETS,
                                                 load_retrieval_classes)


def test_table_shapes_and_pairing():
    for cs, n in (("coco", 80), ("lvis", 1203)):
        for lang in ("zh", "en"):
            names = load_retrieval_classes(cs, lang)
            assert len(names) == n, (cs, lang)
            assert all(isinstance(x, str) and x for x in names)
    assert set(CLASS_SETS) == {"coco", "lvis"}


def test_known_anchors():
    """Category order must match the protocol: spot-pin first/last and
    a middle entry of each table in both languages."""
    coco_en = load_retrieval_classes("coco", "en")
    coco_zh = load_retrieval_classes("coco", "zh")
    assert coco_en[0] == "person" and coco_zh[0] == "人"
    assert coco_en[-1] == "toothbrush" and coco_zh[-1] == "牙刷"
    assert coco_en[15] == "cat" and coco_zh[15] == "猫"
    lvis_en = load_retrieval_classes("lvis", "en")
    lvis_zh = load_retrieval_classes("lvis", "zh")
    assert lvis_en[0] == "aerosol_can" and lvis_zh[0] == "喷雾罐"
    assert lvis_zh[-1] == "西葫芦"          # zucchini


def test_unknown_keys_raise():
    with pytest.raises(KeyError):
        load_retrieval_classes("objects365")
    with pytest.raises(KeyError):
        load_retrieval_classes("coco", "fr")


def test_cli_class_set_wiring(tmp_path):
    """extract_embedding --class-set loads the canonical table (zh by
    default, the reference's scoring language) without touching the
    dataset's own names."""
    import json

    from wedetect_tpu.cli.extract_embedding import parse_args

    args = parse_args(["--ann", "x.json", "--img-root", "imgs",
                       "--class-set", "lvis"])
    assert args.class_set == "lvis" and args.lang == "zh"
    # the resolution order main() implements: --class-texts wins,
    # then --class-set, then dataset names
    names = load_retrieval_classes(args.class_set, args.lang)
    assert len(names) == 1203
