"""Visualization utilities (reference no_time_to_train/dataset/visualization.py
and the memory-bank overlays of matching_baseline_utils.py:188-350).

PIL-based GT-vs-prediction side-by-side panels, per-dataset palettes, mask
overlays with contours, and the k-means / PCA memory visualizations.
"""
import os

import numpy as np
from PIL import Image, ImageDraw

PALETTES = {
    "coco": [(220, 20, 60), (0, 82, 0), (0, 182, 199), (255, 160, 122),
             (119, 11, 32), (0, 60, 100), (0, 0, 230), (106, 0, 228),
             (60, 179, 113), (255, 215, 0)],
    "default": [(230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
                (245, 130, 48), (145, 30, 180), (70, 240, 240),
                (240, 50, 230), (210, 245, 60), (250, 190, 190)],
}


def _color(idx, dataset_name=None):
    pal = PALETTES.get(dataset_name or "default", PALETTES["default"])
    return pal[idx % len(pal)]


def draw_box_on_image(draw, box, color, width=2, label=None, font=None):
    """reference visualization.py:19 — XYXY box + optional label."""
    x1, y1, x2, y2 = [float(v) for v in box]
    draw.rectangle([x1, y1, x2, y2], outline=color, width=width)
    if label:
        draw.text((x1 + 2, max(0, y1 - 12)), label, fill=color, font=font)


def _overlay_masks(img, masks, labels, alpha=0.5, dataset_name=None):
    base = np.asarray(img).astype(np.float32)
    for i, m in enumerate(masks):
        color = np.asarray(_color(int(labels[i]) if labels is not None else i,
                                  dataset_name), np.float32)
        mb = np.asarray(m, bool)
        base[mb] = base[mb] * (1 - alpha) + color * alpha
    return Image.fromarray(base.clip(0, 255).astype(np.uint8))


def vis_coco(gt_bboxes, gt_labels, gt_masks, scores, labels, bboxes,
             masks_pred, score_thr, img_path, out_path, show_scores=False,
             dataset_name=None, class_names=None):
    """GT-vs-pred side-by-side panel (reference visualization.py:94)."""
    img = Image.open(img_path).convert("RGB")
    w, h = img.size

    gt_panel = img.copy()
    if len(gt_masks):
        gt_panel = _overlay_masks(gt_panel, gt_masks, gt_labels,
                                  dataset_name=dataset_name)
    d = ImageDraw.Draw(gt_panel)
    for i, box in enumerate(gt_bboxes if len(gt_bboxes) else []):
        lab = int(gt_labels[i]) if i < len(gt_labels) else 0
        name = class_names[lab] if class_names and lab < len(class_names) \
            else str(lab)
        draw_box_on_image(d, box, _color(lab, dataset_name), label=name)

    keep = [i for i in range(len(scores)) if scores[i] >= score_thr]
    pred_panel = img.copy()
    if keep and len(masks_pred):
        pred_panel = _overlay_masks(pred_panel,
                                    [masks_pred[i] for i in keep],
                                    [labels[i] for i in keep],
                                    dataset_name=dataset_name)
    d = ImageDraw.Draw(pred_panel)
    for i in keep:
        lab = int(labels[i])
        name = class_names[lab] if class_names and lab < len(class_names) \
            else str(lab)
        text = f"{name} {scores[i]:.2f}" if show_scores else name
        draw_box_on_image(d, bboxes[i], _color(lab, dataset_name), label=text)

    canvas = Image.new("RGB", (w * 2 + 5, h), (255, 255, 255))
    canvas.paste(gt_panel, (0, 0))
    canvas.paste(pred_panel, (w + 5, 0))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    canvas.save(out_path)
    return out_path


def vis_results_online(output, tar_anns_by_cat, ori_hw, img_path, out_dir,
                       score_thr=0.5, show_scores=True, dataset_name=None,
                       class_names=None):
    """Reference matching_baseline_utils.vis_results_online (:753-829):
    render one image's predictions vs GT to results_analysis/<dataset>/.

    tar_anns_by_cat carries GT at the square model input size; predictions
    are at the original size — GT boxes/masks are rescaled to ori_hw here."""
    ori_h, ori_w = ori_hw
    gt_masks, gt_boxes, gt_labels = [], [], []
    for cat_ind, e in (tar_anns_by_cat or {}).items():
        for j in range(len(e.get("bboxes", []))):
            box = np.asarray(e["bboxes"][j], np.float64)
            s = e["masks"][j].shape[-1] if "masks" in e else None
            if s:
                box = box * np.array([ori_w / s, ori_h / s] * 2)
            gt_boxes.append(box)
            gt_labels.append(cat_ind)
            if "masks" in e:
                m = Image.fromarray(
                    (np.asarray(e["masks"][j]) > 0.5).astype(np.uint8) * 255)
                gt_masks.append(
                    np.asarray(m.resize((ori_w, ori_h), Image.NEAREST)) > 0)
    out_path = os.path.join(out_dir, os.path.basename(img_path))
    return vis_coco(gt_boxes, gt_labels, gt_masks, output["scores"],
                    output["labels"], output["bboxes"],
                    output["binary_masks"], score_thr, img_path, out_path,
                    show_scores=show_scores, dataset_name=dataset_name,
                    class_names=class_names)


def vis_pca(ref_img, ref_feats_grid, pca_mean, pca_components):
    """Project per-patch features onto 3 PCA components -> RGB heatmap
    (reference vis_pca :253-310). ref_feats_grid: [gh, gw, D]."""
    gh, gw, d = ref_feats_grid.shape
    flat = ref_feats_grid.reshape(-1, d) - pca_mean[None]
    proj = flat @ np.asarray(pca_components).T  # [N, 3]
    lo, hi = proj.min(0), proj.max(0)
    rgb = (proj - lo) / np.maximum(hi - lo, 1e-6)
    rgb = (rgb.reshape(gh, gw, 3) * 255).astype(np.uint8)
    out = Image.fromarray(rgb).resize(ref_img.size, Image.NEAREST)
    return Image.blend(ref_img.convert("RGB"), out, 0.7)


def vis_kmeans(ref_img, ref_feats_grid, centers):
    """Color patches by nearest (cosine) k-means center
    (reference vis_kmeans :188-252)."""
    gh, gw, d = ref_feats_grid.shape
    flat = ref_feats_grid.reshape(-1, d)
    fn = flat / np.maximum(np.linalg.norm(flat, axis=-1, keepdims=True), 1e-9)
    cn = centers / np.maximum(np.linalg.norm(centers, axis=-1, keepdims=True),
                              1e-9)
    assign = (fn @ cn.T).argmax(-1)
    colors = np.array([_color(i) for i in range(len(centers))], np.uint8)
    rgb = colors[assign].reshape(gh, gw, 3)
    out = Image.fromarray(rgb).resize(ref_img.size, Image.NEAREST)
    return Image.blend(ref_img.convert("RGB"), out, 0.7)


def vis_memory(ref_img_np, ref_feats_grid, cat_ind, bank, out_dir,
               img_id=0):
    """Side-by-side original | k-means | PCA overlay of one reference
    (reference vis_memory :663-751)."""
    os.makedirs(out_dir, exist_ok=True)
    img = Image.fromarray((np.asarray(ref_img_np) * 255).astype(np.uint8))
    km = vis_kmeans(img, ref_feats_grid,
                    np.asarray(bank.feats_centers[cat_ind]))
    pc = vis_pca(img, ref_feats_grid, np.asarray(bank.pca_mean[cat_ind]),
                 np.asarray(bank.pca_components[cat_ind]))
    w, h = img.size
    canvas = Image.new("RGB", (w * 3 + 10, h), (255, 255, 255))
    canvas.paste(img, (0, 0))
    canvas.paste(km, (w + 5, 0))
    canvas.paste(pc, (2 * w + 10, 0))
    path = os.path.join(out_dir, f"{cat_ind}_{img_id}.png")
    canvas.save(path)
    return path
