"""Synthetic COCO-format dataset for tests and environment-local runs.

The reference requires the real COCO FSOD annotation packs; this
environment has no image data, so `synth_fsod` generates deterministic
images (colored rectangles with distinct per-class hues on noise
backgrounds) plus a COCO-format annotation JSON, exercising every data
path (roidb, episodic loaders, eval) end-to-end.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np

from dana_tpu.data.coco_split import CocoFormatDataset

_CLASS_COLORS = {
    'red': (40, 40, 200), 'green': (40, 200, 40), 'blue': (200, 40, 40),
    'yellow': (40, 200, 200), 'magenta': (200, 40, 200),
    'cyan': (200, 200, 40), 'white': (230, 230, 230), 'gray': (120, 120, 120),
}


def generate_synth_dataset(root: str, split: str = 'train',
                           num_images: int = 60, seed: int = 0,
                           img_hw=(480, 640), max_boxes: int = 4):
    """Write images + annotations; idempotent per (root, split)."""
    import cv2
    ann_file = osp.join(root, f'annotations_{split}.json')
    img_dir = osp.join(root, f'images_{split}')
    if osp.exists(ann_file):
        return ann_file, img_dir
    os.makedirs(img_dir, exist_ok=True)
    # per-split stream: distinct splits must never share image RNG
    # (a plain +1 offset made 'test' a prefix of other splits); crc32 is
    # stable across processes, unlike builtin str hash
    import zlib
    rng = np.random.default_rng([seed, zlib.crc32(split.encode())])
    names = list(_CLASS_COLORS)
    images, annotations = [], []
    ann_id = 1
    h, w = img_hw
    for i in range(num_images):
        im = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)
        n_box = int(rng.integers(1, max_boxes + 1))
        for _ in range(n_box):
            cls = int(rng.integers(0, len(names)))
            bw = int(rng.integers(80, 240))
            bh = int(rng.integers(80, 240))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            color = _CLASS_COLORS[names[cls]]
            jitter = rng.integers(-25, 25, 3)
            c = tuple(int(np.clip(cc + jj, 0, 255))
                      for cc, jj in zip(color, jitter))
            cv2.rectangle(im, (x1, y1), (x1 + bw, y1 + bh), c, -1)
            # distinguishing inner pattern per class
            cv2.circle(im, (x1 + bw // 2, y1 + bh // 2),
                       min(bw, bh) // 4, (int(c[0] // 2), int(c[1] // 2),
                                          int(c[2] // 2)), -1)
            annotations.append({
                'id': ann_id, 'image_id': i + 1, 'category_id': cls + 1,
                'bbox': [float(x1), float(y1), float(bw), float(bh)],
                'area': float(bw * bh), 'iscrowd': 0})
            ann_id += 1
        fname = f'synth_{split}_{i + 1:06d}.jpg'
        cv2.imwrite(osp.join(img_dir, fname), im)
        images.append({'id': i + 1, 'file_name': fname,
                       'width': w, 'height': h})
    categories = [{'id': k + 1, 'name': n, 'supercategory': 'synth'}
                  for k, n in enumerate(names)]
    with open(ann_file, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    return ann_file, img_dir


def synth_fsod(split: str = 'train', root: str | None = None,
               num_images: int = 60):
    root = root or os.environ.get(
        'DANA_SYNTH_ROOT', osp.join(os.path.expanduser('~'), '.dana_synth'))
    ann_file, img_dir = generate_synth_dataset(root, split, num_images)
    return CocoFormatDataset(f'synth_{split}', ann_file, img_dir)
