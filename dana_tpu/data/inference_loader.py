"""Evaluation-time episodic loaders.

Parity targets in /root/reference/lib/roi_data_layer/:
  InferenceLoader (inference_loader.py:23-115) — fixed seeded support
    shots per class from a directory pool `data/supports/<cls>/*.jpg`;
    each query image is evaluated against its single annotated target
    class (gt_boxes[0][4], inference.py:131-139).
  MultiwayLoader (multiway_loader.py) — n-way support stacks per query.
  ALLCLSFSLoader (allcls_fs_loader.py) — resamples supports per item.
  OracleLoader / GeneralTestLoader — query-only loaders.
  FinetuneLoader (finetune_loader.py) — training-style loader whose
    supports come from the directory pool.

TPU adaptation: queries pad onto static bucket canvases; when the support
directory pool is absent, supports fall back to crops from a provided
support roidb (build_support_db) so environment-local datasets work.
"""

from __future__ import annotations

import glob
import os.path as osp

import numpy as np

from dana_tpu.data import blob
from dana_tpu.data.fs_loader import build_support_db


class SupportPool:
    """Fixed per-class support images, seeded like the reference
    (inference_loader.py:61-71: random.seed(epi_random_seed) sample)."""

    def __init__(self, classes, num_shot, support_dir=None,
                 support_roidb=None, seed=0, pixel_means=None,
                 support_size=320):
        from dana_tpu.utils.config import cfg
        self.num_shot = num_shot
        self.support_size = support_size
        self.pixel_means = (pixel_means if pixel_means is not None
                            else cfg.PIXEL_MEANS)
        self._images = {}          # cls index -> [support blob arrays]
        rng = np.random.default_rng(seed)
        if support_dir and osp.isdir(support_dir):
            for cls_ind, name in enumerate(classes):
                if name == '__background__':
                    continue
                files = sorted(glob.glob(osp.join(support_dir, name, '*')))
                if not files:
                    continue
                pick = rng.choice(len(files), num_shot,
                                  replace=len(files) < num_shot)
                blobs = []
                for i in pick:
                    im = blob.imread_bgr(files[int(i)])
                    h, w = im.shape[:2]
                    blobs.append(blob.support_blob(
                        im, [0, 0, w - 1, h - 1], self.pixel_means,
                        support_size))
                self._images[cls_ind] = blobs
        elif support_roidb is not None:
            db = build_support_db(support_roidb, len(classes))
            for cls_ind in range(1, len(classes)):
                pool = db[cls_ind]
                if not pool:
                    continue
                pick = rng.choice(len(pool), num_shot,
                                  replace=len(pool) < num_shot)
                blobs = []
                for i in pick:
                    entry = support_roidb[pool[int(i)]['roidb_idx']]
                    im = blob.imread_bgr(entry['image'])
                    blobs.append(blob.support_blob(
                        im, pool[int(i)]['box'], self.pixel_means,
                        support_size))
                self._images[cls_ind] = blobs
        else:
            raise ValueError('need support_dir or support_roidb')

    def classes_available(self):
        return sorted(self._images)

    def get(self, cls_ind):
        return np.stack(self._images[cls_ind])   # [shot, S, S, 3]


class InferenceLoader:
    """One episode per query image against its fixed target class."""

    def __init__(self, roidb, pool: SupportPool, max_num_box=20,
                 buckets=None, scale=None, max_size=None,
                 pixel_means=None):
        from dana_tpu.utils.config import cfg
        buckets = buckets or [tuple(b) for b in cfg.TPU.SIZE_BUCKETS]
        scale = scale or cfg.TEST.SCALES[0]
        max_size = max_size or cfg.TEST.MAX_SIZE
        self.roidb = roidb
        self.pool = pool
        self.max_num_box = max_num_box
        self.buckets = buckets
        self.scale = scale
        self.max_size = max_size
        self.pixel_means = (pixel_means if pixel_means is not None
                            else cfg.PIXEL_MEANS)

    def __len__(self):
        return len(self.roidb)

    def bucket_of(self, index):
        e = self.roidb[index]
        h, w = e['height'], e['width']
        s = min(float(self.scale) / min(h, w),
                float(self.max_size) / max(h, w))
        return blob.pick_bucket(round(h * s), round(w * s), self.buckets)

    def target_class(self, index):
        entry = self.roidb[index]
        return int(entry['gt_classes'][0])

    def __getitem__(self, index):
        entry = self.roidb[index]
        im = blob.imread_bgr(entry['image'])
        im_data, im_info = blob.query_blob(
            im, self.pixel_means, self.scale, self.max_size,
            buckets=self.buckets)
        cls = self.target_class(index)
        gt = np.zeros((self.max_num_box, 5), np.float32)
        n = min(len(entry['boxes']), self.max_num_box)
        gt[:n, :4] = entry['boxes'][:n] * im_info[2]
        gt[:n, 4] = entry['gt_classes'][:n]
        return {
            'im_data': im_data, 'im_info': im_info, 'gt_boxes': gt,
            'num_boxes': np.int32(n),
            'support_ims': self.pool.get(cls),
            'target_cls': np.int32(cls), 'index': np.int32(index),
        }


class GeneralTestLoader(InferenceLoader):
    """Query-only loader (general_test_loader.py:48-68): no supports."""

    def __init__(self, roidb, **kw):
        kw.pop('pool', None)
        super().__init__(roidb, pool=None, **kw)

    def __getitem__(self, index):
        entry = self.roidb[index]
        im = blob.imread_bgr(entry['image'])
        im_data, im_info = blob.query_blob(
            im, self.pixel_means, self.scale, self.max_size,
            buckets=self.buckets)
        return {'im_data': im_data, 'im_info': im_info,
                'num_boxes': np.int32(0), 'index': np.int32(index)}


OracleLoader = GeneralTestLoader


class MultiwayLoader(InferenceLoader):
    """n-way eval (multiway_loader.py:88-129): stacks way*shot supports —
    classes present in the query first, padded with absent classes."""

    def __init__(self, roidb, pool, num_way=5, **kw):
        super().__init__(roidb, pool, **kw)
        self.num_way = num_way

    def __getitem__(self, index):
        item = super().__getitem__(index)
        entry = self.roidb[index]
        present = sorted({int(c) for c in entry['gt_classes'] if c != 0
                          and int(c) in self.pool._images})
        absent = [c for c in self.pool.classes_available()
                  if c not in present]
        ways = (present + absent)[:self.num_way]
        sup = np.stack([self.pool.get(c) for c in ways])  # [way,shot,S,S,3]
        item['support_ims'] = sup.reshape(-1, *sup.shape[2:])
        item['selected_ways'] = np.array(ways, np.int32)
        return item


class ALLCLSFSLoader(InferenceLoader):
    """Per-item random support resample (allcls_fs_loader.py:103-108)."""

    def __init__(self, roidb, support_roidb, classes, num_shot,
                 seed=0, **kw):
        self._support_roidb = support_roidb
        self._classes = classes
        self._num_shot = num_shot
        self._seed = seed
        pool = SupportPool(classes, num_shot, support_roidb=support_roidb,
                           seed=seed)
        super().__init__(roidb, pool, **kw)

    def __getitem__(self, index):
        # fresh pool sample per item
        self.pool = SupportPool(self._classes, self._num_shot,
                                support_roidb=self._support_roidb,
                                seed=(self._seed, index).__hash__() & 0xffff)
        return super().__getitem__(index)
