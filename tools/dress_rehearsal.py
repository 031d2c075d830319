"""Dress rehearsal of the reference's real-COCO workflows (VERDICT r2
item 2): synthesize the EXACT reference directory layouts + file-name
schemas, author a reference-format .pth checkpoint, then run the
README's verbatim entry commands end-to-end — so the only untested
thing left on real COCO is the pixels.

Reference layouts exercised (coco_split.py:68-143, README.md:60-100):
  data/coco/annotations/coco60_train/instances_set1.json    (60 base cls)
  data/coco/annotations/coco20_evaluate/instances_set1.json (20 novel)
  data/coco/annotations/ft/instances_shot30.json            (ft 30-shot)
  data/coco/images/train2014/COCO_train2014_%012d.jpg
  data/coco/images/val2014/COCO_val2014_%012d.jpg
  data/supports/<class name>/*.jpg
  models/DAnA_coco_ft30/train/checkpoints/model_4_299.pth
    ({'model','epoch','optimizer','pooling_mode'} wrapper,
     reference train.py:183-189)

Commands run verbatim (README.md:127 train, README.md:147 inference);
fast mode APPENDS shrink overrides after the verbatim flags (argparse
last-wins), which is the only deviation — a 1-core CPU cannot run
608x1024 canvases.

Usage:
  python tools/dress_rehearsal.py --root /tmp/rehearsal          (fast)
  python tools/dress_rehearsal.py --root ... --full              (TPU)
  python tools/dress_rehearsal.py ... --skip-train / --skip-infer
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# The official 80 COCO categories (id, name).  The FSOD split holds out
# the 20 PASCAL-VOC-overlapping classes as novel (the standard protocol
# behind coco60_train / coco20_evaluate).
COCO_CATEGORIES = [
    (1, 'person'), (2, 'bicycle'), (3, 'car'), (4, 'motorcycle'),
    (5, 'airplane'), (6, 'bus'), (7, 'train'), (8, 'truck'), (9, 'boat'),
    (10, 'traffic light'), (11, 'fire hydrant'), (13, 'stop sign'),
    (14, 'parking meter'), (15, 'bench'), (16, 'bird'), (17, 'cat'),
    (18, 'dog'), (19, 'horse'), (20, 'sheep'), (21, 'cow'),
    (22, 'elephant'), (23, 'bear'), (24, 'zebra'), (25, 'giraffe'),
    (27, 'backpack'), (28, 'umbrella'), (31, 'handbag'), (32, 'tie'),
    (33, 'suitcase'), (34, 'frisbee'), (35, 'skis'), (36, 'snowboard'),
    (37, 'sports ball'), (38, 'kite'), (39, 'baseball bat'),
    (40, 'baseball glove'), (41, 'skateboard'), (42, 'surfboard'),
    (43, 'tennis racket'), (44, 'bottle'), (46, 'wine glass'),
    (47, 'cup'), (48, 'fork'), (49, 'knife'), (50, 'spoon'), (51, 'bowl'),
    (52, 'banana'), (53, 'apple'), (54, 'sandwich'), (55, 'orange'),
    (56, 'broccoli'), (57, 'carrot'), (58, 'hot dog'), (59, 'pizza'),
    (60, 'donut'), (61, 'cake'), (62, 'chair'), (63, 'couch'),
    (64, 'potted plant'), (65, 'bed'), (67, 'dining table'),
    (70, 'toilet'), (72, 'tv'), (73, 'laptop'), (74, 'mouse'),
    (75, 'remote'), (76, 'keyboard'), (77, 'cell phone'),
    (78, 'microwave'), (79, 'oven'), (80, 'toaster'), (81, 'sink'),
    (82, 'refrigerator'), (84, 'book'), (85, 'clock'), (86, 'vase'),
    (87, 'scissors'), (88, 'teddy bear'), (89, 'hair drier'),
    (90, 'toothbrush'),
]
NOVEL_IDS = {1, 2, 3, 4, 5, 6, 7, 9, 16, 17, 18, 19, 20, 21, 44, 62, 63,
             64, 67, 72}
BASE_CATS = [(i, n) for i, n in COCO_CATEGORIES if i not in NOVEL_IDS]
NOVEL_CATS = [(i, n) for i, n in COCO_CATEGORIES if i in NOVEL_IDS]


def _class_color(cat_id):
    rng = np.random.default_rng(cat_id)
    return tuple(int(v) for v in rng.integers(60, 255, 3))


def _draw_image(path, hw, boxes_cats, seed):
    import cv2
    rng = np.random.default_rng(seed)
    im = rng.integers(0, 50, (*hw, 3)).astype(np.uint8)
    for (x, y, w, h), cid in boxes_cats:
        c = _class_color(cid)
        cv2.rectangle(im, (int(x), int(y)), (int(x + w), int(y + h)), c, -1)
        cv2.circle(im, (int(x + w / 2), int(y + h / 2)),
                   max(2, int(min(w, h) / 4)),
                   tuple(v // 2 for v in c), -1)
    cv2.imwrite(path, im)


def _make_split(root, split, cats, n_images, hw, id_base, seed,
                one_class_per_image=False, shots_per_class=None):
    """Write images/<split>/COCO_<split>_%012d.jpg + a COCO ann dict."""
    img_dir = osp.join(root, 'data', 'coco', 'images', split)
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = id_base * 100000 + 1
    h, w = hw
    per_class_count = {cid: 0 for cid, _ in cats}
    for i in range(n_images):
        img_id = id_base * 10000 + i + 1
        fname = f'COCO_{split}_{img_id:012d}.jpg'
        if one_class_per_image:
            cid = cats[i % len(cats)][0]
            pool = [cid]
        else:
            pool = [cats[int(j)][0] for j in
                    rng.integers(0, len(cats), 3)]
        boxes = []
        for cid in pool:
            bw = int(rng.integers(int(h * 0.25), int(h * 0.6)))
            bh = int(rng.integers(int(h * 0.25), int(h * 0.6)))
            x = int(rng.integers(0, w - bw))
            y = int(rng.integers(0, h - bh))
            if shots_per_class is not None and \
                    per_class_count[cid] >= shots_per_class:
                continue
            per_class_count[cid] += 1
            boxes.append(((x, y, bw, bh), cid))
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': cid,
                'bbox': [float(x), float(y), float(bw), float(bh)],
                'area': float(bw * bh), 'iscrowd': 0})
            ann_id += 1
        _draw_image(osp.join(img_dir, fname), hw, boxes, seed + i)
        images.append({'id': img_id, 'file_name': fname,
                       'width': w, 'height': h})
    return {'images': images, 'annotations': annotations,
            'categories': [{'id': i, 'name': n, 'supercategory': 'none'}
                           for i, n in cats]}


def build_tree(root, fast=True):
    """Idempotent synthetic reference-layout tree."""
    marker = osp.join(root, '.rehearsal_complete')
    if osp.exists(marker):
        return
    hw = (240, 320) if fast else (480, 640)
    n_train = 16 if fast else 240
    n_val = 10 if fast else 100
    ann_root = osp.join(root, 'data', 'coco', 'annotations')

    base_cats = BASE_CATS[:8] if fast else BASE_CATS
    novel_cats = NOVEL_CATS[:4] if fast else NOVEL_CATS

    d = osp.join(ann_root, 'coco60_train')
    os.makedirs(d, exist_ok=True)
    pack = _make_split(root, 'train2014', base_cats, n_train, hw, 1, 11)
    with open(osp.join(d, 'instances_set1.json'), 'w') as f:
        json.dump(pack, f)

    d = osp.join(ann_root, 'coco20_evaluate')
    os.makedirs(d, exist_ok=True)
    # the eval protocol fixes one target class per query image, baked
    # into the annotation json (README.md:66): one class per image
    pack = _make_split(root, 'val2014', novel_cats, n_val, hw, 2, 22,
                       one_class_per_image=True)
    with open(osp.join(d, 'instances_set1.json'), 'w') as f:
        json.dump(pack, f)

    d = osp.join(ann_root, 'ft')
    os.makedirs(d, exist_ok=True)
    shots = 3 if fast else 30
    pack = _make_split(root, 'train2014', novel_cats,
                       shots * len(novel_cats), hw, 3, 33,
                       one_class_per_image=True, shots_per_class=shots)
    with open(osp.join(d, 'instances_shot30.json'), 'w') as f:
        json.dump(pack, f)

    # data/supports/<class name>/*.jpg (inference_loader.py:61-71)
    for cid, name in novel_cats:
        sd = osp.join(root, 'data', 'supports', name)
        os.makedirs(sd, exist_ok=True)
        for k in range(5):
            _draw_image(osp.join(sd, f'support_{k}.jpg'), (160, 160),
                        [((20, 20, 120, 120), cid)], 1000 * cid + k)

    open(marker, 'w').close()


def write_reference_pth(root, fast=True):
    """models/DAnA_coco_ft30/train/checkpoints/model_4_299.pth in the
    exact reference wrapper, from a randomly-initialized full-width
    param tree, and verify it round-trips through our loader."""
    path = osp.join(root, 'models', 'DAnA_coco_ft30', 'train',
                    'checkpoints', 'model_4_299.pth')
    if osp.exists(path):
        return path
    os.makedirs(osp.dirname(path), exist_ok=True)
    from dana_tpu.models import dana
    from dana_tpu.utils.torch_import import save_reference_pth
    config = dana.DanaConfig(n_way=2, n_shot=3)
    params = dana.init_params(config, seed=0)
    save_reference_pth(path, params, epoch=4, pooling_mode='align')

    # round-trip structural check: the .pth must land on the exact tree
    from dana_tpu.utils import checkpoint as ckpt_lib
    got = ckpt_lib.load_checkpoint(path)
    assert got['epoch'] == 4 and got['pooling_mode'] == 'align'

    def paths(t, p=''):
        for k in sorted(t):
            v = t[k]
            yield from paths(v, f'{p}.{k}') if isinstance(v, dict) \
                else [f'{p}.{k}']
    want, have = set(paths(params)), set(paths(got['model']))
    assert want == have, (want - have, have - want)
    return path


FAST_OVERRIDES = [
    '--epochs', '1', '--disp_interval', '1', '--dlog',
    '--set',
    'TRAIN.SCALES', '(128,)', 'TEST.SCALES', '(128,)',
    'TRAIN.RPN_PRE_NMS_TOP_N', '300', 'TRAIN.RPN_POST_NMS_TOP_N', '48',
    'TEST.RPN_PRE_NMS_TOP_N', '300', 'TEST.RPN_POST_NMS_TOP_N', '48',
    'TRAIN.RPN_BATCHSIZE', '64', 'TRAIN.BATCH_SIZE', '32',
    'TPU.NMS_MAX_INPUT', '300',
    'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
]

# README.md:127 — verbatim
TRAIN_CMD = ['train.py', '--dataset', 'coco_base', '--flip', '--net',
             'DAnA', '--lr', '0.001', '--lr_decay_step', '12', '--bs',
             '4', '--epochs', '16', '--disp_interval', '20',
             '--save_dir', 'models/DAnA', '--way', '2', '--shot', '3']
# README.md:147 — verbatim
INFER_CMD = ['inference.py', '--eval', '--dataset', 'val2014_novel',
             '--net', 'DAnA', '--r', '--load_dir', 'models/DAnA_coco_ft30',
             '--checkepoch', '4', '--checkpoint', '299', '--bs', '1',
             '--shot', '3', '--eval_dir', 'dana']


def run_cmd(cmd, root, fast=True, extra=()):
    full = [sys.executable, osp.join(REPO, cmd[0])] + cmd[1:]
    if fast:
        full += FAST_OVERRIDES
    full += list(extra)
    env = dict(os.environ)
    if fast:
        # CPU subprocess: the repo alone on PYTHONPATH (drops the TPU
        # tunnel's sitecustomize, which would override JAX_PLATFORMS)
        env.update(PYTHONPATH=REPO, JAX_PLATFORMS='cpu')
    else:
        # TPU subprocess keeps the container env (axon plugin on
        # PYTHONPATH); just prepend the repo
        env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    print('+', ' '.join(full[1:]), flush=True)
    subprocess.run(full, cwd=root, env=env, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/root/repo/.scratch/rehearsal')
    ap.add_argument('--full', action='store_true',
                    help='real shapes (TPU); default is CPU-fast')
    ap.add_argument('--skip-train', action='store_true')
    ap.add_argument('--skip-infer', action='store_true')
    args = ap.parse_args()
    fast = not args.full

    os.makedirs(args.root, exist_ok=True)
    build_tree(args.root, fast=fast)
    pth = write_reference_pth(args.root, fast=fast)
    print(f'reference-format checkpoint: {pth}')

    if not args.skip_train:
        run_cmd(TRAIN_CMD, args.root, fast=fast)
        ck = osp.join(args.root, 'models', 'DAnA', 'train', 'checkpoints')
        assert os.listdir(ck), 'train command produced no checkpoint'
        print(f'train rehearsal OK: {sorted(os.listdir(ck))[-1]}')
    if not args.skip_infer:
        run_cmd(INFER_CMD, args.root, fast=fast)
        out = osp.join(args.root, 'dana', 'detections.pkl')
        assert osp.exists(out), 'inference produced no detections.pkl'
        print('inference rehearsal OK')
    print('REHEARSAL COMPLETE')


if __name__ == '__main__':
    main()
