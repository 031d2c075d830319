"""Property test: dana_tpu/eval/coco_eval.py must agree EXACTLY with the
pycocotools-faithful oracle (tests/cocoeval_oracle.py) on randomized
det/gt sets covering crowds, ignore flags, area-range edges, score ties,
and >maxDets overflow.  This is the independent cross-check for the
pure-numpy COCOeval replacement the north-star AP claim rests on
(reference protocol: /root/reference/lib/datasets/coco_split.py:287-298).
"""

import numpy as np
import pytest

from dana_tpu.data.coco_json import COCO
from dana_tpu.eval import coco_eval as ce

from cocoeval_oracle import run_oracle


def _random_scenario(seed):
    rng = np.random.default_rng(seed)
    n_imgs = int(rng.integers(1, 6))
    n_cats = int(rng.integers(1, 4))
    img_ids = list(range(1, n_imgs + 1))
    cat_ids = list(rng.choice(np.arange(1, 10), n_cats, replace=False))
    W, H = 640, 480

    def rand_box(small_bias):
        # sizes spanning the small/medium/large area boundaries (32^2, 96^2)
        if small_bias and rng.random() < 0.4:
            w = float(rng.uniform(4, 40))
            h = float(rng.uniform(4, 40))
        elif rng.random() < 0.3:
            w = float(rng.uniform(90, 102))   # straddles 96^2 edge
            h = float(rng.uniform(90, 102))
        else:
            w = float(rng.uniform(20, 200))
            h = float(rng.uniform(20, 200))
        x = float(rng.uniform(0, W - w))
        y = float(rng.uniform(0, H - h))
        return [x, y, w, h]

    anns, dets = [], []
    k = 1
    for img in img_ids:
        for cat in cat_ids:
            n_gt = int(rng.integers(0, 6))
            boxes = []
            for _ in range(n_gt):
                b = rand_box(small_bias=True)
                a = {'id': k, 'image_id': img, 'category_id': int(cat),
                     'bbox': b, 'area': b[2] * b[3],
                     'iscrowd': int(rng.random() < 0.15)}
                if rng.random() < 0.1:
                    a['ignore'] = 1
                anns.append(a)
                boxes.append(b)
                k += 1
            # detections: jittered TPs + random FPs, tied scores sometimes
            n_det = int(rng.integers(0, 9))
            if rng.random() < 0.07:
                n_det = 120            # exceed maxDets=100 for one cell
            for d in range(n_det):
                if boxes and rng.random() < 0.6:
                    gx, gy, gw, gh = boxes[int(rng.integers(len(boxes)))]
                    jit = rng.uniform(-0.3, 0.3, 4)
                    b = [gx + jit[0] * gw, gy + jit[1] * gh,
                         max(1.0, gw * (1 + jit[2])),
                         max(1.0, gh * (1 + jit[3]))]
                else:
                    b = rand_box(small_bias=False)
                score = float(np.round(rng.random(), 2))   # frequent ties
                dets.append({'image_id': img, 'category_id': int(cat),
                             'bbox': [float(v) for v in b], 'score': score})
    images = [{'id': i, 'width': W, 'height': H} for i in img_ids]
    cats = [{'id': int(c), 'name': f'c{c}'} for c in sorted(cat_ids)]
    gt = COCO(dataset={'images': images, 'annotations': anns,
                       'categories': cats})
    return gt, dets


@pytest.mark.parametrize('seed', range(60))
def test_matches_pycocotools_oracle(seed):
    gt, dets = _random_scenario(seed)
    if not dets:
        pytest.skip('empty detection set')
    dt = gt.loadRes(dets)

    ours = ce.evaluate_detections(gt, dt)
    oracle = run_oracle(gt, dt)

    np.testing.assert_allclose(ours['precision'],
                               oracle.eval['precision'], atol=1e-10,
                               err_msg=f'precision mismatch (seed {seed})')
    np.testing.assert_allclose(ours['recall'], oracle.eval['recall'],
                               atol=1e-10,
                               err_msg=f'recall mismatch (seed {seed})')
    np.testing.assert_allclose(ours['stats'], oracle.stats, atol=1e-10,
                               err_msg=f'stats mismatch (seed {seed})')


def test_crowd_and_ignore_edge():
    """Crowd gt absorbs multiple dets without counting as TP/FP; ignored
    gt does not add to npig."""
    images = [{'id': 1, 'width': 640, 'height': 480}]
    anns = [
        {'id': 1, 'image_id': 1, 'category_id': 1,
         'bbox': [10, 10, 100, 100], 'area': 10000, 'iscrowd': 1},
        {'id': 2, 'image_id': 1, 'category_id': 1,
         'bbox': [300, 300, 50, 50], 'area': 2500, 'iscrowd': 0},
        {'id': 3, 'image_id': 1, 'category_id': 1,
         'bbox': [500, 100, 40, 40], 'area': 1600, 'iscrowd': 0,
         'ignore': 1},
    ]
    gt = COCO(dataset={'images': images, 'annotations': anns,
                       'categories': [{'id': 1, 'name': 'c'}]})
    dets = [
        {'image_id': 1, 'category_id': 1, 'bbox': [12, 12, 60, 60],
         'score': 0.9},       # inside crowd -> ignored
        {'image_id': 1, 'category_id': 1, 'bbox': [40, 40, 60, 60],
         'score': 0.85},      # also inside crowd -> ignored
        {'image_id': 1, 'category_id': 1, 'bbox': [300, 300, 50, 50],
         'score': 0.8},       # TP on the real gt
        {'image_id': 1, 'category_id': 1, 'bbox': [500, 100, 40, 40],
         'score': 0.7},       # matches ignored gt -> ignored
    ]
    dt = gt.loadRes(dets)
    ours = ce.evaluate_detections(gt, dt)
    oracle = run_oracle(gt, dt)
    np.testing.assert_allclose(ours['stats'], oracle.stats, atol=1e-10)
    assert abs(ours['stats'][1] - 1.0) < 1e-9   # AP50 = 1: only real gt counts
