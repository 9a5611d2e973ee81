"""Golden anchoring of the COCOeval/LVIS re-implementations.

pycocotools is not installed in this environment (forced rewrite), so the
AP semantics are anchored two independent ways:

1. A from-first-principles brute-force evaluator written here with NO code
   shared with data/cocoeval.py: per-(image, category, threshold) greedy
   matching straight from the COCO protocol definition, exhaustive
   envelope-max 101-point interpolation, naive pixel-counting mask IoU.
   Randomized datasets exercise crowd, explicit ignore, all area ranges,
   all maxDets tiers, bbox + segm, multi-image score interleaving.
2. Hand-derived closed-form fixtures (exact expected stats).

The protocol itself (greedy best-IoU matching preferring non-ignored GT,
crowd reusability, unmatched-out-of-range ignoring) is shared by definition —
what these tests pin down is that every branch of the optimized
implementation agrees with a direct transcription of the rules.
Reference eval semantics: /root/reference/no_time_to_train/dataset/
coco_ref_dataset.py:616-662 (COCOeval bbox+segm, maxDets tiers).
"""
import json

import numpy as np
import pytest

from no_time_to_train_tpu.data import rle as rle_mod
from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.cocoeval import COCOeval
from no_time_to_train_tpu.data.lvis_eval import LVISEval

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
AREA_RNGS = [(0, 1e5 ** 2), (0, 32 ** 2), (32 ** 2, 96 ** 2),
             (96 ** 2, 1e5 ** 2)]


# --------------------------------------------------------------- naive eval
def _naive_bbox_iou(d, g, crowd):
    dx1, dy1, dx2, dy2 = d[0], d[1], d[0] + d[2], d[1] + d[3]
    gx1, gy1, gx2, gy2 = g[0], g[1], g[0] + g[2], g[1] + g[3]
    iw = max(0.0, min(dx2, gx2) - max(dx1, gx1))
    ih = max(0.0, min(dy2, gy2) - max(dy1, gy1))
    inter = iw * ih
    da = d[2] * d[3]
    ga = g[2] * g[3]
    union = da if crowd else da + ga - inter
    return inter / union if union > 0 else 0.0


def _naive_mask_iou(dm, gm, crowd):
    inter = float(np.logical_and(dm, gm).sum())
    union = float(dm.sum()) if crowd else float(np.logical_or(dm, gm).sum())
    return inter / union if union > 0 else 0.0


def naive_evaluate(gt_anns, dt_anns, img_ids, cat_ids, iou_of,
                   max_dets=(1, 10, 100), ne_pairs=()):
    """Brute-force COCO evaluation.

    gt_anns: list of dicts with image_id/category_id/area/iscrowd/ignore
    dt_anns: list of dicts with image_id/category_id/area/score
    iou_of(d, g) -> float IoU honouring crowd semantics
    ne_pairs: set of (img, cat) where unmatched dts are ignored (LVIS
      not_exhaustive semantics)
    Returns precision[T, R, K, A, M], recall[T, K, A, M].
    """
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(AREA_RNGS), len(max_dets)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))

    for k, cat in enumerate(cat_ids):
        for a, (lo, hi) in enumerate(AREA_RNGS):
            for m, maxd in enumerate(max_dets):
                # per image: match, collect (score, tp, ignored) per T
                recs = {t: [] for t in range(T)}
                npig = 0
                any_ann = False
                for img in img_ids:
                    gts = [g for g in gt_anns if g["image_id"] == img
                           and g["category_id"] == cat]
                    dts = [d for d in dt_anns if d["image_id"] == img
                           and d["category_id"] == cat]
                    if not gts and not dts:
                        continue
                    any_ann = True
                    # ignore = explicit | crowd | out of area range
                    gig = [bool(g.get("ignore", 0)) or bool(g["iscrowd"])
                           or g["area"] < lo or g["area"] > hi for g in gts]
                    npig_img = sum(1 for x in gig if not x)
                    npig += npig_img
                    # score-desc, stable; truncate to maxd
                    order = sorted(range(len(dts)),
                                   key=lambda i: -dts[i]["score"])
                    dts = [dts[i] for i in order][:maxd]
                    ne = (img, cat) in ne_pairs
                    for t in range(T):
                        thr = IOU_THRS[t]
                        taken = [False] * len(gts)
                        for d in dts:
                            # best-IoU non-ignored unmatched gt first;
                            # fall back to ignored gts (crowd reusable)
                            best, best_iou = -1, None
                            for gi, g in enumerate(gts):
                                if gig[gi] or taken[gi]:
                                    continue
                                v = iou_of(d, g)
                                if v >= min(thr, 1 - 1e-10) and (
                                        best < 0 or v > best_iou):
                                    best, best_iou = gi, v
                            if best < 0:
                                for gi, g in enumerate(gts):
                                    if not gig[gi]:
                                        continue
                                    if taken[gi] and not g["iscrowd"]:
                                        continue
                                    v = iou_of(d, g)
                                    if v >= min(thr, 1 - 1e-10) and (
                                            best < 0 or v > best_iou):
                                        best, best_iou = gi, v
                            if best >= 0:
                                if not gts[best]["iscrowd"]:
                                    taken[best] = True
                                ignored = gig[best]
                                recs[t].append((d["score"], not ignored,
                                                ignored))
                            else:
                                out = d["area"] < lo or d["area"] > hi or ne
                                recs[t].append((d["score"], False, out))
                if not any_ann or npig == 0:
                    continue
                for t in range(T):
                    rows = sorted(recs[t], key=lambda r: -r[0])
                    tp = fp = 0
                    pr, rc = [], []
                    for score, is_tp, ig in rows:
                        if ig:
                            continue
                        tp += is_tp
                        fp += not is_tp
                        pr.append(tp / (tp + fp))
                        rc.append(tp / npig)
                    recall[t, k, a, m] = rc[-1] if rc else 0.0
                    q = np.zeros(R)
                    for ri, rthr in enumerate(REC_THRS):
                        # envelope max at first recall >= rthr (exact float
                        # comparison — the protocol's searchsorted semantics)
                        idx = next((i for i, r in enumerate(rc)
                                    if r >= rthr), None)
                        if idx is not None:
                            q[ri] = max(pr[idx:])
                    precision[t, :, k, a, m] = q
    return precision, recall


def _stats_from(precision, recall, max_dets=(1, 10, 100)):
    def _ap(t=None, a=0, m=len(max_dets) - 1):
        s = precision[:, :, :, a, m] if t is None else precision[t, :, :, a, m]
        v = s[s > -1]
        return float(v.mean()) if v.size else -1.0

    def _ar(a=0, m=len(max_dets) - 1):
        s = recall[:, :, a, m]
        v = s[s > -1]
        return float(v.mean()) if v.size else -1.0

    return np.array([
        _ap(), _ap(t=0), _ap(t=5), _ap(a=1), _ap(a=2), _ap(a=3),
        _ar(m=0), _ar(m=1), _ar(m=2), _ar(a=1), _ar(a=2), _ar(a=3)])


# ----------------------------------------------------------- data generator
def _gen_dataset(rng, n_imgs=4, n_cats=3, segm=False, canvas=(64, 96)):
    H, W = canvas
    imgs = [{"id": i + 1, "height": H, "width": W, "file_name": f"{i}.jpg"}
            for i in range(n_imgs)]
    cats = [{"id": 10 * (c + 1), "name": f"c{c}"} for c in range(n_cats)]
    anns, dts = [], []
    aid = 0
    for img in imgs:
        for cat in cats:
            n_gt = int(rng.integers(0, 4))
            for _ in range(n_gt):
                # areas spanning small (<32^2=1024), medium, large (>96^2)
                kind = rng.integers(0, 3)
                if kind == 0:
                    w, h = rng.integers(4, 31, 2)
                elif kind == 1:
                    w, h = rng.integers(33, 60, 2)
                else:
                    w, h = 90, int(rng.integers(90, 96))
                x = float(rng.integers(0, max(1, W - w)))
                y = float(rng.integers(0, max(1, H - h)))
                aid += 1
                ann = {"id": aid, "image_id": img["id"],
                       "category_id": cat["id"],
                       "bbox": [x, y, float(w), float(h)],
                       "area": float(w * h),
                       "iscrowd": int(rng.random() < 0.15),
                       "ignore": int(rng.random() < 0.1)}
                if segm:
                    mask = np.zeros((H, W), np.uint8)
                    mask[int(y):int(y + h), int(x):int(x + w)] = 1
                    ann["segmentation"] = rle_mod.encode_mask(mask)
                    ann["area"] = float(mask.sum())
                anns.append(ann)
                # jittered detections (0-2 per gt)
                for _ in range(int(rng.integers(0, 3))):
                    dx, dy = rng.normal(0, w * 0.15), rng.normal(0, h * 0.15)
                    dw = max(3.0, w * float(rng.normal(1.0, 0.2)))
                    dh = max(3.0, h * float(rng.normal(1.0, 0.2)))
                    bx = min(max(0.0, x + dx), W - 3)
                    by = min(max(0.0, y + dy), H - 3)
                    dw = min(dw, W - bx)
                    dh = min(dh, H - by)
                    det = {"image_id": img["id"], "category_id": cat["id"],
                           "bbox": [bx, by, dw, dh],
                           "score": float(rng.random())}
                    if segm:
                        dm = np.zeros((H, W), np.uint8)
                        dm[int(by):int(by + dh), int(bx):int(bx + dw)] = 1
                        det["segmentation"] = rle_mod.encode_mask(dm)
                    dts.append(det)
            # background false positives
            for _ in range(int(rng.integers(0, 3))):
                w, h = rng.integers(4, 40, 2)
                x = float(rng.integers(0, W - w))
                y = float(rng.integers(0, H - h))
                det = {"image_id": img["id"], "category_id": cat["id"],
                       "bbox": [x, y, float(w), float(h)],
                       "score": float(rng.random())}
                if segm:
                    dm = np.zeros((H, W), np.uint8)
                    dm[int(y):int(y + h), int(x):int(x + w)] = 1
                    det["segmentation"] = rle_mod.encode_mask(dm)
                dts.append(det)
    gt = {"images": imgs, "categories": cats, "annotations": anns}
    return gt, dts


def _run_ours(gt, dts, iou_type, tmp_path, eval_cls=COCOeval):
    p = tmp_path / "gt.json"

    def default(o):
        return o.tolist() if hasattr(o, "tolist") else o
    p.write_text(json.dumps(gt, default=default))
    coco = COCO(str(p))
    res = coco.loadRes([dict(d) for d in dts])
    ev = eval_cls(coco, res, iou_type)
    ev.evaluate()
    ev.accumulate()
    return ev


def _naive_iou_fn(coco, iou_type, canvas):
    if iou_type == "bbox":
        return lambda d, g: _naive_bbox_iou(
            d["bbox"], g["bbox"], bool(g["iscrowd"]))
    H, W = canvas
    cache = {}

    def as_mask(ann):
        key = id(ann)
        if key not in cache:
            cache[key] = rle_mod.decode_rle(ann["segmentation"]).astype(bool)
        return cache[key]

    return lambda d, g: _naive_mask_iou(as_mask(d), as_mask(g),
                                        bool(g["iscrowd"]))


@pytest.mark.parametrize("iou_type", ["bbox", "segm"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cocoeval_matches_naive(tmp_path, iou_type, seed):
    rng = np.random.default_rng(seed)
    gt, dts = _gen_dataset(rng, segm=(iou_type == "segm"))
    if not dts:
        pytest.skip("empty draw")
    ev = _run_ours(gt, dts, iou_type, tmp_path)
    stats = ev.summarize()

    img_ids = [i["id"] for i in gt["images"]]
    cat_ids = sorted(c["id"] for c in gt["categories"])
    # naive dt area must match loadRes semantics (segm -> pixel area)
    for d in dts:
        if iou_type == "segm":
            d["area"] = float(rle_mod.area(d["segmentation"]))
        else:
            d["area"] = d["bbox"][2] * d["bbox"][3]
    iou_fn = _naive_iou_fn(None, iou_type, (64, 96))
    prec, rec = naive_evaluate(gt["annotations"], dts, img_ids, cat_ids,
                               iou_fn)
    expected = _stats_from(prec, rec)
    np.testing.assert_allclose(stats, expected, atol=1e-9,
                               err_msg=f"{iou_type} seed {seed}")


def test_cocoeval_closed_form(tmp_path):
    """Hand-derived fixture: 2 gts, 3 dts (1 TP each + 1 FP between).

    cat 1 img 1: gt A exact-matched at score .9 (TP), FP at .5,
    gt B matched at .3. Raw PR points: (r=.5, p=1), (r=.5, p=.5),
    (r=1, p=2/3). Envelope: p=1 for r<=.5, 2/3 for r in (.5, 1].
    AP = (51*1 + 50*(2/3))/101. All boxes large-area -> APl = AP.
    """
    H = W = 200
    gt = {"images": [{"id": 1, "height": H, "width": W, "file_name": "a"}],
          "categories": [{"id": 1, "name": "x"}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 0},
              {"id": 2, "image_id": 1, "category_id": 1,
               "bbox": [100, 100, 100, 100], "area": 10000.0, "iscrowd": 0}]}
    dts = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [0, 100, 100, 100],
         "score": 0.5},   # overlaps neither gt enough -> FP
        {"image_id": 1, "category_id": 1, "bbox": [100, 100, 100, 100],
         "score": 0.3}]
    ev = _run_ours(gt, dts, "bbox", tmp_path)
    stats = ev.summarize()
    ap = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    assert abs(stats[0] - ap) < 1e-9      # AP averaged over all T (identical)
    assert abs(stats[1] - ap) < 1e-9      # AP50
    assert abs(stats[5] - ap) < 1e-9      # APl
    assert stats[3] == -1 and stats[4] == -1   # no small/medium gts
    assert abs(stats[8] - 1.0) < 1e-9     # AR@100 = 1 (both gts found)
    assert abs(stats[6] - 0.5) < 1e-9     # AR@1: only top-1 det counted


def test_cocoeval_crowd_and_ignore_closed_form(tmp_path):
    """A crowd gt absorbs two detections without making them FPs, an
    explicitly-ignored gt neither helps nor hurts, and the single real gt
    matched by the lowest-scoring det gives AP = 1 (ignored dets drop out
    of the PR sequence entirely)."""
    gt = {"images": [{"id": 1, "height": 100, "width": 100, "file_name": "a"}],
          "categories": [{"id": 1, "name": "x"}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [0, 0, 40, 40], "area": 1600.0, "iscrowd": 1},
              {"id": 2, "image_id": 1, "category_id": 1,
               "bbox": [50, 0, 40, 40], "area": 1600.0, "iscrowd": 0,
               "ignore": 1},
              {"id": 3, "image_id": 1, "category_id": 1,
               "bbox": [50, 50, 40, 40], "area": 1600.0, "iscrowd": 0}]}
    dts = [
        # two dets inside the crowd region (both match the crowd -> ignored)
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 40, 40],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [2, 2, 38, 38],
         "score": 0.8},
        # det on the ignored gt -> ignored
        {"image_id": 1, "category_id": 1, "bbox": [50, 0, 40, 40],
         "score": 0.7},
        # det on the real gt
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 40, 40],
         "score": 0.1}]
    ev = _run_ours(gt, dts, "bbox", tmp_path)
    stats = ev.summarize()
    assert abs(stats[0] - 1.0) < 1e-9
    assert abs(stats[8] - 1.0) < 1e-9


@pytest.mark.parametrize("seed", [0, 1])
def test_lvis_eval_matches_naive(tmp_path, seed):
    """LVIS semantics: maxDets=300, neg_category_ids drop detections,
    not_exhaustive ignores unmatched detections, APr/c/f buckets."""
    rng = np.random.default_rng(100 + seed)
    gt, dts = _gen_dataset(rng, n_imgs=3, n_cats=3)
    freqs = ["r", "c", "f"]
    for i, c in enumerate(gt["categories"]):
        c["frequency"] = freqs[i % 3]
    cat_ids = sorted(c["id"] for c in gt["categories"])
    # image 1: cat_ids[0] negatively annotated (its dets must be dropped);
    # image 2: cat_ids[1] not exhaustively annotated
    gt["images"][0]["neg_category_ids"] = [cat_ids[0]]
    gt["images"][1]["not_exhaustive_category_ids"] = [cat_ids[1]]
    # neg_category_ids implies no gt of that class in the image
    gt["annotations"] = [a for a in gt["annotations"]
                         if not (a["image_id"] == gt["images"][0]["id"]
                                 and a["category_id"] == cat_ids[0])]
    if not dts:
        pytest.skip("empty draw")
    ev = _run_ours(gt, dts, "bbox", tmp_path, eval_cls=LVISEval)
    stats = ev.summarize()

    img_ids = [i["id"] for i in gt["images"]]
    for d in dts:
        d["area"] = d["bbox"][2] * d["bbox"][3]
    dts_kept = [d for d in dts
                if not (d["image_id"] == gt["images"][0]["id"]
                        and d["category_id"] == cat_ids[0])]
    ne_pairs = {(gt["images"][1]["id"], cat_ids[1])}
    iou_fn = _naive_iou_fn(None, "bbox", (64, 96))
    prec, rec = naive_evaluate(gt["annotations"], dts_kept, img_ids, cat_ids,
                               iou_fn, max_dets=(300,), ne_pairs=ne_pairs)

    def ap(mask=None, area=0):
        s = prec[:, :, :, area, -1]
        if mask is not None:
            s = s[:, :, mask]
        v = s[s > -1]
        return float(v.mean()) if v.size else -1.0

    farr = np.array([freqs[i % 3] for i in range(len(cat_ids))])
    # categories sorted by id == insertion order here (ids 10,20,30)
    np.testing.assert_allclose(stats["AP"], ap(), atol=1e-9)
    np.testing.assert_allclose(stats["APr"], ap(farr == "r"), atol=1e-9)
    np.testing.assert_allclose(stats["APc"], ap(farr == "c"), atol=1e-9)
    np.testing.assert_allclose(stats["APf"], ap(farr == "f"), atol=1e-9)
    np.testing.assert_allclose(stats["APs"], ap(area=1), atol=1e-9)
    np.testing.assert_allclose(stats["APm"], ap(area=2), atol=1e-9)
    np.testing.assert_allclose(stats["APl"], ap(area=3), atol=1e-9)
