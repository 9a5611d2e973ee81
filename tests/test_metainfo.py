"""Class-split registry invariants (reference dataset/metainfo.py:234-294 and
dataset/cd_vito_paper_coco_zeroshot_categories.py)."""
from no_time_to_train_tpu.data.metainfo import METAINFO


def test_split_sizes():
    assert len(METAINFO["default_classes"]) == 80
    assert len(METAINFO["few_shot_classes"]) == 20
    for i in (1, 2, 3, 4):
        assert len(METAINFO[f"coco_semantic_split_{i}"]) == 20
    for i in (1, 2, 3):
        assert len(METAINFO[f"pascal_voc_split_{i}"]) == 5
    assert len(METAINFO["lvis"]) == 1203
    assert len(METAINFO["lvis_common"]) == 461
    assert len(METAINFO["lvis_frequent"]) == 405
    assert len(METAINFO["lvis_rare"]) == 337


def test_split_consistency():
    default = set(METAINFO["default_classes"])
    assert set(METAINFO["few_shot_classes"]) <= default
    # semantic splits partition COCO-80
    sem = [set(METAINFO[f"coco_semantic_split_{i}"]) for i in (1, 2, 3, 4)]
    assert set().union(*sem) == default
    assert sum(len(s) for s in sem) == 80
    # LVIS frequency buckets partition the 1203 classes
    lv = [set(METAINFO[k]) for k in ("lvis_common", "lvis_frequent",
                                     "lvis_rare")]
    assert set().union(*lv) == set(METAINFO["lvis"])


def test_zeroshot_split():
    seen = set(METAINFO["coco_zeroshot_seen"])
    unseen = set(METAINFO["coco_zeroshot_unseen"])
    assert len(seen) == 48 and len(unseen) == 17
    assert not seen & unseen
    assert seen | unseen == set(METAINFO["coco_zeroshot_all"])
    assert seen | unseen <= set(METAINFO["default_classes"])
