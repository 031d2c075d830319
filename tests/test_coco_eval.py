"""COCOeval-replacement correctness on crafted cases."""

import numpy as np

from dana_tpu.data.coco_json import COCO
from dana_tpu.eval import coco_eval as ce


def _dataset(gts):
    """gts: {img_id: [(cat, x, y, w, h)]} -> COCO gt object."""
    images = [{'id': i, 'width': 640, 'height': 480}
              for i in sorted({i for i in gts})]
    anns = []
    k = 1
    for img, boxes in gts.items():
        for cat, x, y, w, h in boxes:
            anns.append({'id': k, 'image_id': img, 'category_id': cat,
                         'bbox': [x, y, w, h], 'area': w * h, 'iscrowd': 0})
            k += 1
    cats = [{'id': c, 'name': f'c{c}'}
            for c in sorted({b[0] for bs in gts.values() for b in bs})]
    return COCO(dataset={'images': images, 'annotations': anns,
                         'categories': cats})


def _res(coco, dets):
    """dets: [(img, cat, x, y, w, h, score)] -> result COCO."""
    return coco.loadRes([
        {'image_id': i, 'category_id': c, 'bbox': [x, y, w, h],
         'score': s} for (i, c, x, y, w, h, s) in dets])


def test_perfect_detections_ap1():
    gt = _dataset({1: [(1, 10, 10, 100, 100), (2, 200, 200, 50, 50)],
                   2: [(1, 30, 40, 80, 60)]})
    dets = [(1, 1, 10, 10, 100, 100, 0.9), (1, 2, 200, 200, 50, 50, 0.8),
            (2, 1, 30, 40, 80, 60, 0.95)]
    r = ce.evaluate_detections(gt, _res(gt, dets))
    assert abs(r['stats'][0] - 1.0) < 1e-6
    assert abs(r['stats'][1] - 1.0) < 1e-6


def test_missed_and_false_positive():
    # 2 gts of one class; detector finds one perfectly plus one FP that
    # outranks it.  PR: (r=0, p=0) then (r=0.5, p=0.5); envelope 0.5 up to
    # recall 0.5 -> 101-pt AP50 = 0.5 * 51/101 ~= 0.2525.
    gt = _dataset({1: [(1, 10, 10, 100, 100), (1, 300, 300, 60, 60)]})
    dets = [(1, 1, 500, 10, 50, 50, 0.95),      # FP, highest score
            (1, 1, 10, 10, 100, 100, 0.9)]      # TP
    r = ce.evaluate_detections(gt, _res(gt, dets))
    assert abs(r['stats'][1] - 0.5 * 51 / 101) < 1e-6


def test_localization_threshold():
    # det IoU ~0.55 with gt: counts at IoU 0.5 but not at 0.75
    gt = _dataset({1: [(1, 0, 0, 100, 100)]})
    dets = [(1, 1, 0, 0, 73, 100, 0.9)]          # IoU = 0.73
    r = ce.evaluate_detections(gt, _res(gt, dets))
    assert r['stats'][1] > 0.99                  # AP50 = 1
    assert r['stats'][2] < 0.01                  # AP75 = 0


def test_crowd_gt_ignored():
    gt_data = {1: [(1, 0, 0, 100, 100)]}
    coco = _dataset(gt_data)
    # add a crowd annotation: detections matching it are ignored, and it
    # never counts as a missed gt
    coco.dataset['annotations'].append(
        {'id': 99, 'image_id': 1, 'category_id': 1,
         'bbox': [300, 300, 100, 100], 'area': 10000, 'iscrowd': 1})
    coco._index()
    dets = [(1, 1, 0, 0, 100, 100, 0.9),
            (1, 1, 300, 300, 100, 100, 0.8)]     # matches crowd -> ignored
    r = ce.evaluate_detections(coco, _res(coco, dets))
    assert abs(r['stats'][1] - 1.0) < 1e-6
