"""Pure-numpy COCO detection evaluation (pycocotools.COCOeval replacement).

Implements the standard COCOeval bbox protocol the reference relies on
(/root/reference/lib/datasets/coco_split.py:254-298): greedy per-category
matching at IoU thresholds 0.5:0.95:0.05, crowd/ignore handling, area
ranges, maxDets, 101-point interpolated precision, and the 12-number
summarize() table plus the per-class AP printout the reference adds.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    'all': (0.0, 1e10),
    'small': (0.0, 32.0 ** 2),
    'medium': (32.0 ** 2, 96.0 ** 2),
    'large': (96.0 ** 2, 1e10),
}


def box_iou_xywh(dets: np.ndarray, gts: np.ndarray, iscrowd) -> np.ndarray:
    """IoU of [D,4] x [G,4] xywh boxes; for crowd gt, IoU = intersection /
    det area (pycocotools maskUtils.iou semantics)."""
    d_area = dets[:, 2] * dets[:, 3]
    g_area = gts[:, 2] * gts[:, 3]
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, :2] + dets[:, None, 2:4],
                    gts[None, :, :2] + gts[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = d_area[:, None] + g_area[None, :] - inter
    crowd = np.asarray(iscrowd, bool)
    union = np.where(crowd[None, :], d_area[:, None], union)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _evaluate_img(dets, gts, area_rng, max_dets):
    """Match one (image, category): returns (dt_matches [T,D], dt_ignore
    [T,D], gt_ignore [G], dt_scores [D]) following COCOeval.evaluateImg."""
    t = len(IOU_THRS)
    g_boxes = np.array([g['bbox'] for g in gts], np.float64).reshape(-1, 4)
    g_crowd = np.array([g.get('iscrowd', 0) for g in gts], bool)
    g_area = np.array([g.get('area', b[2] * b[3])
                       for g, b in zip(gts, g_boxes)], np.float64)
    g_ignore = (np.array([g.get('ignore', 0) for g in gts], bool)
                | g_crowd
                | (g_area < area_rng[0]) | (g_area > area_rng[1]))
    # gts sorted: non-ignored first (stable)
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

    # Greedy matching, vectorized over the T thresholds (the det loop is
    # inherently sequential).  Semantics pinned to pycocotools
    # evaluateImg by tests/test_coco_eval_oracle.py:
    #   * gts sorted non-ignored-first; a det first takes the best
    #     available non-ignored gt, else the best available ignored one
    #     (the `break` in the reference loop).
    #   * "available" = unmatched, or crowd (crowd absorbs many dets).
    #   * ties on IoU pick the LAST gt in sort order (the loop updates on
    #     iou >= current best).
    dt_m = np.zeros((t, nd), np.int64) - 1       # matched gt index or -1
    thr_eff = np.minimum(IOU_THRS, 1 - 1e-10)[:, None]       # [T,1]
    nni = int((~g_ignore).sum())                 # non-ignored prefix length
    gt_taken = np.zeros((t, ng), bool)
    t_idx = np.arange(t)

    def _last_argmax(cand, vals_row):
        """Per threshold row: last index of the max value among candidates,
        -1 if no candidate.  cand [T,W], vals_row [W]."""
        w = cand.shape[1]
        if w == 0:
            return np.zeros((t,), bool), np.zeros((t,), np.int64)
        vals = np.where(cand, vals_row[None, :], -1.0)
        rev_best = np.argmax(vals[:, ::-1], axis=1)
        best = w - 1 - rev_best
        return cand.any(axis=1), best

    for di in range(nd):
        iou_row = ious[di]
        cand = ((~gt_taken) | g_crowd[None, :]) \
            & (iou_row[None, :] >= thr_eff)                   # [T,G]
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


class COCOEvalResult(dict):
    pass


def evaluate_detections(coco_gt, coco_dt, img_ids=None, cat_ids=None,
                        max_dets=(1, 10, 100)):
    """Full bbox evaluation.  Returns a dict with 'precision'
    [T, R, K, A, M], 'recall' [T, K, A, M], 'stats' (the 12 summary
    numbers), and 'per_class_ap' {cat_id: AP@[.5:.95]}."""
    img_ids = sorted(img_ids) if img_ids else coco_gt.getImgIds()
    cat_ids = sorted(cat_ids) if cat_ids else coco_gt.getCatIds()
    areas = list(AREA_RNG.values())
    t, r = len(IOU_THRS), len(REC_THRS)
    k, a, m = len(cat_ids), len(areas), len(max_dets)
    md = max(max_dets)

    # gather per (cat, area, img) match results at maxDet=md, then slice
    precision = -np.ones((t, r, k, a, m))
    recall = -np.ones((t, k, a, m))
    for ki, cid in enumerate(cat_ids):
        per_img_dets = [coco_dt.loadAnns(coco_dt.getAnnIds(imgIds=i,
                                                           catIds=[cid]))
                        for i in img_ids]
        per_img_gts = [coco_gt.loadAnns(coco_gt.getAnnIds(imgIds=i,
                                                          catIds=[cid]))
                       for i in img_ids]
        for ai, rng in enumerate(areas):
            results = [
                _evaluate_img(d, g, rng, md)
                for d, g in zip(per_img_dets, per_img_gts)
                if len(d) or len(g)]
            if not results:
                continue
            for mi, mdet in enumerate(max_dets):
                dtm = np.concatenate(
                    [x[0][:, :mdet] for x in results], axis=1)
                dtig = np.concatenate(
                    [x[1][:, :mdet] for x in results], axis=1)
                scores = np.concatenate([x[3][:mdet] for x in results])
                n_gt = int(sum((~x[2]).sum() for x in results))
                if n_gt == 0:
                    continue
                order = np.argsort(-scores, kind='mergesort')
                dtm, dtig = dtm[:, order], dtig[:, order]
                tps = dtm & ~dtig
                fps = ~dtm & ~dtig
                tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
                for ti in range(t):
                    tp, fp = tp_cum[ti], fp_cum[ti]
                    rc = tp / n_gt
                    pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
                    recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                    # precision envelope (monotone non-increasing)
                    pr = pr.tolist()
                    for i in range(len(pr) - 1, 0, -1):
                        pr[i - 1] = max(pr[i - 1], pr[i])
                    inds = np.searchsorted(rc, REC_THRS, side='left')
                    q = np.zeros(r)
                    for ri, pi in enumerate(inds):
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[ti, :, ki, ai, mi] = q

    def _summ(ap=True, iou=None, area='all', mdet=100):
        ai = list(AREA_RNG.keys()).index(area)
        mi = max_dets.index(mdet)
        if ap:
            s = precision[:, :, :, ai, mi]
            if iou is not None:
                s = s[np.isclose(IOU_THRS, iou)]
        else:
            s = recall[:, :, ai, mi]
            if iou is not None:
                s = s[np.isclose(IOU_THRS, iou)]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    stats = [
        _summ(True), _summ(True, 0.5), _summ(True, 0.75),
        _summ(True, area='small'), _summ(True, area='medium'),
        _summ(True, area='large'),
        _summ(False, mdet=max_dets[0]), _summ(False, mdet=max_dets[1]),
        _summ(False, mdet=max_dets[2]),
        _summ(False, area='small'), _summ(False, area='medium'),
        _summ(False, area='large'),
    ]
    per_class = {}
    ai = 0
    mi = max_dets.index(100) if 100 in max_dets else m - 1
    for ki, cid in enumerate(cat_ids):
        s = precision[:, :, ki, ai, mi]
        s = s[s > -1]
        per_class[cid] = float(np.mean(s)) if s.size else float('nan')
    return COCOEvalResult(precision=precision, recall=recall, stats=stats,
                          per_class_ap=per_class, iou_thrs=IOU_THRS)


def print_summary(result):
    names = [
        ('AP', '0.50:0.95', 'all', 100), ('AP', '0.50', 'all', 100),
        ('AP', '0.75', 'all', 100), ('AP', '0.50:0.95', 'small', 100),
        ('AP', '0.50:0.95', 'medium', 100), ('AP', '0.50:0.95', 'large', 100),
        ('AR', '0.50:0.95', 'all', 1), ('AR', '0.50:0.95', 'all', 10),
        ('AR', '0.50:0.95', 'all', 100), ('AR', '0.50:0.95', 'small', 100),
        ('AR', '0.50:0.95', 'medium', 100), ('AR', '0.50:0.95', 'large', 100),
    ]
    for (kind, iou, area, mdet), v in zip(names, result['stats']):
        word = 'Precision' if kind == 'AP' else 'Recall   '
        print(f' Average {word} ({kind}) @[ IoU={iou:9s} | '
              f'area={area:6s} | maxDets={mdet:3d} ] = {v:0.3f}')
