"""COCOeval wall-clock benchmark at real scale (VERDICT r2 item 4).

Synthesizes a COCO-like eval scenario (default 5000 images x 20
categories, ~6 gts and ~40 dets per (img, cat) pair present) and times:

  * new: evaluate_detections — IoU matrix + annotation parsing hoisted
    once per (img, cat), greedy matching memoized on the per-area
    gt-ignore pattern, vectorized precision envelope.
  * old (--compare): the round-2 structure — _evaluate_img re-preps and
    re-matches per (cat, area, img), i.e. 4x IoU + 4x matching.

Usage:  python tools/bench_coco_eval.py [--images 5000] [--cats 20]
        [--compare]   (add the old-structure timing; ~4x slower, so the
                       default skips it for quick runs)
        [--quick]     (500 images — CI/smoke scale)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _MiniCOCO:
    """Minimal COCO-API shim over in-memory anns (getAnnIds/loadAnns/
    getImgIds/getCatIds) — enough for eval.coco_eval."""

    def __init__(self, anns, img_ids, cat_ids):
        self._by_img_cat = {}
        self._anns = {a['id']: a for a in anns}
        for a in anns:
            self._by_img_cat.setdefault(
                (a['image_id'], a['category_id']), []).append(a['id'])
        self._img_ids = list(img_ids)
        self._cat_ids = list(cat_ids)

    def getImgIds(self):
        return list(self._img_ids)

    def getCatIds(self):
        return list(self._cat_ids)

    def getAnnIds(self, imgIds, catIds):
        ids = imgIds if isinstance(imgIds, list) else [imgIds]
        out = []
        for i in ids:
            for c in catIds:
                out += self._by_img_cat.get((i, c), [])
        return out

    def loadAnns(self, ids):
        return [self._anns[i] for i in ids]


def synth(n_images, n_cats, seed=0):
    rng = np.random.default_rng(seed)
    img_ids = list(range(1, n_images + 1))
    cat_ids = list(range(1, n_cats + 1))
    gts, dts = [], []
    gid = did = 1
    for img in img_ids:
        # each image holds gts for ~2 random categories
        for cat in rng.choice(cat_ids, size=2, replace=False):
            n_gt = int(rng.integers(1, 7))
            for _ in range(n_gt):
                x, y = rng.uniform(0, 500, 2)
                w, h = rng.uniform(8, 150, 2)
                gts.append({'id': gid, 'image_id': img,
                            'category_id': int(cat),
                            'bbox': [x, y, w, h], 'area': w * h,
                            'iscrowd': int(rng.random() < 0.03)})
                gid += 1
                # ~2 dets near each gt + some background noise
                for _ in range(int(rng.integers(1, 4))):
                    jx, jy = rng.normal(0, 8, 2)
                    dts.append({'id': did, 'image_id': img,
                                'category_id': int(cat),
                                'bbox': [x + jx, y + jy,
                                         w * rng.uniform(0.8, 1.2),
                                         h * rng.uniform(0.8, 1.2)],
                                'score': float(rng.random())})
                    did += 1
            for _ in range(30):     # background false positives
                x, y = rng.uniform(0, 500, 2)
                w, h = rng.uniform(8, 80, 2)
                dts.append({'id': did, 'image_id': img,
                            'category_id': int(cat),
                            'bbox': [x, y, w, h],
                            'score': float(rng.random() * 0.4)})
                did += 1
    return (_MiniCOCO(gts, img_ids, cat_ids),
            _MiniCOCO(dts, img_ids, cat_ids), img_ids, cat_ids)


def _evaluate_img_r2(dets, gts, area_rng, max_dets):
    """Verbatim round-2 matching (pre-hoist): re-parses anns, recomputes
    IoU, runs the two-stage per-det loop with no low-IoU skip.  Kept here
    ONLY as the benchmark baseline for the speedup claim."""
    from dana_tpu.eval.coco_eval import IOU_THRS, box_iou_xywh
    t = len(IOU_THRS)
    g_boxes = np.array([g['bbox'] for g in gts], np.float64).reshape(-1, 4)
    g_crowd = np.array([g.get('iscrowd', 0) for g in gts], bool)
    g_area = np.array([g.get('area', b[2] * b[3])
                       for g, b in zip(gts, g_boxes)], np.float64)
    g_ignore = (np.array([g.get('ignore', 0) for g in gts], bool)
                | g_crowd
                | (g_area < area_rng[0]) | (g_area > area_rng[1]))
    g_order = np.argsort(g_ignore, kind='stable')
    g_boxes, g_crowd, g_ignore = g_boxes[g_order], g_crowd[g_order], \
        g_ignore[g_order]
    d_scores = np.array([d['score'] for d in dets], np.float64)
    d_order = np.argsort(-d_scores, kind='stable')[:max_dets]
    d_boxes = np.array([dets[i]['bbox'] for i in d_order],
                       np.float64).reshape(-1, 4)
    d_scores = d_scores[d_order]
    nd, ng = len(d_boxes), len(g_boxes)
    ious = box_iou_xywh(d_boxes, g_boxes, g_crowd) if nd and ng else \
        np.zeros((nd, ng))
    dt_m = np.zeros((t, nd), np.int64) - 1
    thr_eff = np.minimum(IOU_THRS, 1 - 1e-10)[:, None]
    nni = int((~g_ignore).sum())
    gt_taken = np.zeros((t, ng), bool)
    t_idx = np.arange(t)

    def _last_argmax(cand, vals_row):
        w = cand.shape[1]
        if w == 0:
            return np.zeros((t,), bool), np.zeros((t,), np.int64)
        vals = np.where(cand, vals_row[None, :], -1.0)
        rev_best = np.argmax(vals[:, ::-1], axis=1)
        return cand.any(axis=1), w - 1 - rev_best

    for di in range(nd):
        iou_row = ious[di]
        cand = ((~gt_taken) | g_crowd[None, :]) \
            & (iou_row[None, :] >= thr_eff)
        any_ni, best_ni = _last_argmax(cand[:, :nni], iou_row[:nni])
        any_ig, best_ig = _last_argmax(cand[:, nni:], iou_row[nni:])
        best = np.where(any_ni, best_ni,
                        np.where(any_ig, best_ig + nni, -1))
        sel = best >= 0
        dt_m[sel, di] = best[sel]
        gt_taken[t_idx[sel], best[sel]] = True

    d_area = d_boxes[:, 2] * d_boxes[:, 3]
    d_out_of_range = (d_area < area_rng[0]) | (d_area > area_rng[1])
    dt_ig = np.zeros((t, nd), bool)
    for ti in range(t):
        if ng:
            matched_ignored = (dt_m[ti] >= 0) & g_ignore[
                np.maximum(dt_m[ti], 0)]
        else:
            matched_ignored = np.zeros((nd,), bool)
        dt_ig[ti] = matched_ignored | ((dt_m[ti] < 0) & d_out_of_range)
    return dt_m >= 0, dt_ig, g_ignore, d_scores


def run_old_structure(gt, dt, img_ids, cat_ids):
    """Round-2 loop shape: per (cat, area, img) re-parse, re-IoU and
    re-match with the r2 matcher (4x everything per (img, cat))."""
    from dana_tpu.eval import coco_eval as ce
    md = 100
    for cid in cat_ids:
        per_img_dets = [dt.loadAnns(dt.getAnnIds(imgIds=i, catIds=[cid]))
                        for i in img_ids]
        per_img_gts = [gt.loadAnns(gt.getAnnIds(imgIds=i, catIds=[cid]))
                       for i in img_ids]
        for rng_ in ce.AREA_RNG.values():
            for d, g in zip(per_img_dets, per_img_gts):
                if len(d) or len(g):
                    _evaluate_img_r2(d, g, rng_, md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=5000)
    ap.add_argument('--cats', type=int, default=20)
    ap.add_argument('--compare', action='store_true')
    ap.add_argument('--quick', action='store_true')
    args = ap.parse_args()
    if args.quick:
        args.images = 500

    from dana_tpu.eval import coco_eval as ce
    gt, dt, img_ids, cat_ids = synth(args.images, args.cats)
    print(f'{args.images} images x {args.cats} cats, '
          f'{len(dt._anns)} dets, {len(gt._anns)} gts')

    t0 = time.perf_counter()
    res = ce.evaluate_detections(gt, dt, img_ids=img_ids, cat_ids=cat_ids)
    t_new = time.perf_counter() - t0
    print(f'new (hoisted) evaluate_detections: {t_new:.2f}s  '
          f'mAP={res["stats"][0]:.3f}')

    if args.compare:
        t0 = time.perf_counter()
        run_old_structure(gt, dt, img_ids, cat_ids)
        t_old = time.perf_counter() - t0
        print(f'old structure (per-area re-prep + re-match): {t_old:.2f}s '
              f'-> speedup {t_old / t_new:.2f}x (matching loop only; the '
              f'old per-element precision-envelope cost is not even '
              f'included)')


if __name__ == '__main__':
    main()
