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
import warnings

import numpy as np

from dana_tpu.data import blob
from dana_tpu.data.fs_loader import build_support_db


def _crop_support(im, box, pixel_means, support_size):
    """Roidb box-crop support prep (our extension — the reference's eval
    supports only ever come from the data/supports directory pool).
    Uses the SAME pipeline the training FewShotLoader used to build the
    checkpoint's support distribution: exact reference crop by default
    (cfg.TPU.EXACT_SUPPORT_SCALE, blob.support_blob_exact)."""
    from dana_tpu.utils.config import cfg
    if cfg.TPU.EXACT_SUPPORT_SCALE:
        # max_size=None unconditionally: the reference's support-source
        # scaling never applies the long-side cap (prep_im_for_blob's
        # cap is commented out, reference blob.py:46-47) — independent
        # of the query-scale mode (advisor r3)
        return blob.support_blob_exact(
            im, box, pixel_means, support_size,
            target_size=cfg.TRAIN.SCALES[0], max_size=None)
    return blob.support_blob(im, box, pixel_means, support_size)


def _list_support_files(support_dir, name):
    """Directory-pool listing, shared by every loader that consumes the
    reference `data/supports/<cls>/` layout: the reference's exact
    Path.glob('*.jpg') enumeration (inference_loader.py:61-65), with a
    sorted any-extension fallback as our extension.  Returns [] when the
    class directory is empty/absent — callers choose skip vs fail-fast."""
    from pathlib import Path
    files = [str(p) for p in Path(osp.join(support_dir, name)).glob('*.jpg')]
    if not files:
        files = sorted(glob.glob(osp.join(support_dir, name, '*')))
    return files


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
            import random as _pyrandom
            for cls_ind, name in enumerate(classes):
                if name == '__background__':
                    continue
                # exact reference selection (inference_loader.py:61-71):
                # Path.glob('*.jpg') listing, random.seed(epi_random_seed)
                # REAPPLIED PER CLASS, stdlib random.sample — on the same
                # directory this picks the identical support files.
                # Random(seed) == (random.seed(seed); random.sample(...))
                # without mutating global RNG state.
                files = _list_support_files(support_dir, name)
                if not files:
                    continue
                if len(files) >= num_shot:
                    picks = _pyrandom.Random(seed).sample(files,
                                                          k=num_shot)
                else:
                    # reference random.sample would raise; sample with
                    # replacement instead (documented deviation)
                    pick = rng.choice(len(files), num_shot, replace=True)
                    picks = [files[int(i)] for i in pick]
                self._images[cls_ind] = [
                    blob.support_blob_whole(blob.imread_bgr(p),
                                            self.pixel_means,
                                            support_size)
                    for p in picks]
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
                    blobs.append(_crop_support(
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
                 pixel_means=None, pack_s2d=False, skip_supports=False):
        from dana_tpu.utils.config import cfg
        buckets = buckets or [tuple(b) for b in cfg.TPU.SIZE_BUCKETS]
        scale = scale or cfg.TEST.SCALES[0]
        if max_size is None:
            # exact reference scaling: no long-side cap (blob.py:44-46
            # comments the cap out in the reference)
            max_size = None if cfg.TPU.EXACT_QUERY_SCALE else \
                cfg.TEST.MAX_SIZE
        self.roidb = roidb
        self.pool = pool
        self.max_num_box = max_num_box
        self.buckets = buckets
        self.scale = scale
        self.max_size = max_size
        self.pixel_means = (pixel_means if pixel_means is not None
                            else cfg.PIXEL_MEANS)
        # ship raw uint8 queries (device-side mean-sub; 4x less wire
        # traffic — cfg knob, see utils/config.py TPU.SHIP_UINT8)
        self.ship_uint8 = bool(cfg.TPU.SHIP_UINT8)
        # emit stem-ready s2d-packed queries ([H', W', 12]) through the
        # fused native pad+pack kernel — the 3-channel canvas never
        # materializes (inference.py sets this when cfg.TPU.STEM_S2D)
        self.pack_s2d = pack_s2d
        # don't assemble per-item support stacks at all: cached-support
        # models (DAnA/cisa) encode each class's supports ONCE and never
        # read batch supports — copying shot x 320x320x3 f32 per image
        # only to discard it wastes the one-core host
        self.skip_supports = skip_supports

    def _query_blob(self, im, flipped=False):
        if self.pack_s2d:
            return blob.query_blob_packed(im, self.pixel_means, self.scale,
                                          self.max_size, flipped=flipped,
                                          buckets=self.buckets,
                                          ship_uint8=self.ship_uint8)
        if self.ship_uint8:
            return blob.query_blob_u8(im, self.scale, self.max_size,
                                      flipped=flipped,
                                      buckets=self.buckets,
                                      pixel_means=self.pixel_means)
        return blob.query_blob(im, self.pixel_means, self.scale,
                               self.max_size, flipped=flipped,
                               buckets=self.buckets)

    def __len__(self):
        return len(self.roidb)

    def bucket_of(self, index):
        e = self.roidb[index]
        h, w = e['height'], e['width']
        s = blob.query_scale(h, w, self.scale, self.max_size)
        return blob.pick_bucket(round(h * s), round(w * s), self.buckets)

    def target_class(self, index):
        entry = self.roidb[index]
        return int(entry['gt_classes'][0])

    def __getitem__(self, index):
        entry = self.roidb[index]
        im = blob.imread_bgr(entry['image'])
        im_data, im_info = self._query_blob(im)
        cls = self.target_class(index)
        gt = np.zeros((self.max_num_box, 5), np.float32)
        n = min(len(entry['boxes']), self.max_num_box)
        gt[:n, :4] = entry['boxes'][:n] * im_info[2]
        gt[:n, 4] = entry['gt_classes'][:n]
        item = {
            'im_data': im_data, 'im_info': im_info, 'gt_boxes': gt,
            'num_boxes': np.int32(n),
            'target_cls': np.int32(cls), 'index': np.int32(index),
        }
        if not self.skip_supports:
            item['support_ims'] = self.pool.get(cls)
        return item


class GeneralTestLoader(InferenceLoader):
    """Query-only loader (general_test_loader.py:48-68): no supports."""

    def __init__(self, roidb, **kw):
        kw.pop('pool', None)
        super().__init__(roidb, pool=None, **kw)

    def __getitem__(self, index):
        entry = self.roidb[index]
        im = blob.imread_bgr(entry['image'])
        im_data, im_info = self._query_blob(im)
        return {'im_data': im_data, 'im_info': im_info,
                'num_boxes': np.int32(0), 'index': np.int32(index)}


class OracleLoader(GeneralTestLoader):
    """Query + ALL-class gt boxes, training-style assembly, no supports —
    for oracle evaluation of a conventional detector
    (/root/reference/lib/roi_data_layer/oracle_loader.py:56-205: shuffled
    gt, degenerate-box filter, fixed max_num_box padding, crop/pad to the
    batch ratio).  TPU adaptation: the static bucket canvas replaces the
    per-batch ratio crop/pad; gt labels keep their original class ids
    (no remap-to-1 — the oracle protocol scores every class)."""

    def __init__(self, roidb, max_num_box=None, seed=1996, **kw):
        from dana_tpu.utils.config import cfg
        super().__init__(
            roidb, max_num_box=max_num_box or cfg.MAX_NUM_GT_BOXES, **kw)
        self.seed = seed

    def __getitem__(self, index):
        item = super().__getitem__(index)   # im_data / im_info / index
        entry = self.roidb[index]
        rng = np.random.default_rng((self.seed, index))
        scale = item['im_info'][2]
        gt = np.zeros((len(entry['boxes']), 5), np.float32)
        gt[:, :4] = entry['boxes'] * scale
        gt[:, 4] = entry['gt_classes']
        rng.shuffle(gt)                      # oracle_loader.py:79
        # degenerate-box filter (oracle_loader.py:183-185)
        keep = (gt[:, 0] != gt[:, 2]) & (gt[:, 1] != gt[:, 3])
        gt = gt[keep][:self.max_num_box]
        gt_pad = np.zeros((self.max_num_box, 5), np.float32)
        gt_pad[:len(gt)] = gt
        item['gt_boxes'] = gt_pad
        item['num_boxes'] = np.int32(len(gt))
        return item


class MultiwayLoader(InferenceLoader):
    """n-way eval (multiway_loader.py:88-129): stacks way*shot supports.

    Way selection replicates the reference exactly
    (multiway_loader.py:88-105): the present-class list is
    `list(set(...))` (LITERALLY — the same CPython set iteration order
    the reference sees for the same class ids); more present classes
    than ways -> seeded random.sample of num_way of them; otherwise the
    negative pad ways are a seeded random.sample of the absent classes.
    `random.seed(epi_random_seed)` is re-applied per item in the
    reference, so random.Random(epi_seed) per draw is equivalent."""

    def __init__(self, roidb, pool, num_way=5, epi_seed=0, **kw):
        super().__init__(roidb, pool, **kw)
        self.num_way = num_way
        self.epi_seed = epi_seed
        # __getitem__ always replaces support_ims with the n-way stack;
        # skip the parent's single-class assembly
        self.skip_supports = True

    def _select_ways(self, gt_classes):
        import random as _pyrandom
        avail_set = set(self.pool.classes_available())
        # availability filter: a no-op when the pool covers every class
        # (the reference raises at init otherwise), but real-data tails
        # can leave a class's support pool empty in crop mode — the
        # reference would crash on pool.get; we drop it from the ways
        present = [c for c in
                   set(int(c) for c in gt_classes if int(c) != 0)
                   if c in avail_set]
        if len(present) > self.num_way:
            return _pyrandom.Random(self.epi_seed).sample(
                present, k=self.num_way)
        # reference: every non-bg class is a negative candidate (its
        # directory pool covers all classes or raises at init); classes
        # without supports here would crash pool.get below just as the
        # reference would — restrict to available ones only when some
        # classes genuinely have no pool (our synthetic-data extension)
        avail = self.pool.classes_available()
        other = [c for c in avail if c not in present]
        ways = list(present)
        ways.extend(_pyrandom.Random(self.epi_seed).sample(
            other, k=min(self.num_way - len(present), len(other))))
        return ways

    def __getitem__(self, index):
        item = super().__getitem__(index)
        entry = self.roidb[index]
        ways = self._select_ways(entry['gt_classes'])
        sup = np.stack([self.pool.get(c) for c in ways])  # [way,shot,S,S,3]
        item['support_ims'] = sup.reshape(-1, *sup.shape[2:])
        item['selected_ways'] = np.array(ways, np.int32)
        return item


class ResamplingSupportPool:
    """SupportPool-compatible pool that samples + decodes supports lazily
    per `get` call — only the requested class's `shot` images are read,
    not the whole num_classes x shot grid.  `reseed(index)` pins the next
    draws to a per-item stream."""

    def __init__(self, classes, num_shot, support_roidb, seed=0,
                 pixel_means=None, support_size=320):
        from dana_tpu.utils.config import cfg
        self.num_shot = num_shot
        self.support_size = support_size
        self.pixel_means = (pixel_means if pixel_means is not None
                            else cfg.PIXEL_MEANS)
        self.support_roidb = support_roidb
        self.db = build_support_db(support_roidb, len(classes))
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        # decoded-crop FIFO cache, same rationale as FewShotLoader's
        # (support_blob is deterministic in (roidb_idx, box))
        self._cache = blob.FIFOCache(cfg.TPU.SUPPORT_CACHE)

    def reseed(self, index):
        self._rng = np.random.default_rng((self.seed, int(index)))

    def classes_available(self):
        return [c for c in range(len(self.db)) if self.db[c]]

    def get(self, cls_ind):
        pool = self.db[cls_ind]
        if not pool:
            raise ValueError(f'class {cls_ind} has an empty support pool')
        pick = self._rng.choice(len(pool), self.num_shot,
                                replace=len(pool) < self.num_shot)
        blobs = []
        for i in pick:
            info = pool[int(i)]
            key = (int(info['roidb_idx']),
                   tuple(float(v) for v in info['box'][:4]))
            hit = self._cache.get(key)
            if hit is not None:
                blobs.append(hit)
                continue
            entry = self.support_roidb[info['roidb_idx']]
            im = blob.imread_bgr(entry['image'])
            blobs.append(self._cache.put(key, _crop_support(
                im, info['box'], self.pixel_means, self.support_size)))
        return np.stack(blobs)


class ALLCLSFSLoader(InferenceLoader):
    """Per-item random support resample (allcls_fs_loader.py:66-115).

    Directory mode (`support_dir`) replicates the reference exactly:
      * support candidates = Path.glob('*.jpg') per class dir, ALL paths
        kept (no init-time subsample, allcls_fs_loader.py:53-60),
      * target class = random.seed(0) + random.sample(k=1) over the
        query's classes in first-appearance gt order
        (allcls_fs_loader.py:87-92),
      * per item: random.seed(index) + random.sample(paths, k=shot)
        (allcls_fs_loader.py:107-108), whole-image prep
        (blob.support_blob_whole).

    Crop mode (`support_roidb`, our extension for directory-less
    datasets) resamples box crops via ResamplingSupportPool — only the
    target class's `shot` supports are decoded per item, not the
    num_classes x shot grid."""

    def __init__(self, roidb, support_roidb=None, classes=None,
                 num_shot=5, seed=0, support_dir=None, **kw):
        self._paths = None
        if support_dir is not None:
            if seed:
                # the reference protocol hardcodes its seeds (0 for the
                # class pick, the item index for supports); a seed that
                # silently did nothing would invalidate sweep results
                raise ValueError('directory mode follows the reference '
                                 'fixed-seed protocol; seed applies to '
                                 'crop mode only')
            # The per-item target class is DETERMINISTIC (Random(0) over
            # first-appearance gt order, allcls_fs_loader.py:87-92), so
            # the exact set of classes the eval will ever sample supports
            # for is computable here.  Only those may hard-fail on a
            # short pool — the reference (allcls_fs_loader.py:108
            # random.sample) never touches the rest, and an eval that was
            # runnable there must stay runnable here (advisor r4).
            import random as _pyrandom
            reachable = set()
            for r in roidb:
                seen = []
                for c in r['gt_classes']:
                    if int(c) and int(c) not in seen:
                        seen.append(int(c))
                if seen:
                    reachable.add(
                        int(_pyrandom.Random(0).sample(seen, k=1)[0]))
            self._paths = {}
            for cls_ind, name in enumerate(classes):
                if name == '__background__':
                    continue
                files = _list_support_files(support_dir, name)
                if not files:
                    # fail fast like the reference
                    # (allcls_fs_loader.py:58-59), not with a KeyError
                    # hours into the eval
                    raise FileNotFoundError(
                        f'support data not found in '
                        f'{osp.join(support_dir, name)}')
                if len(files) < num_shot:
                    # __getitem__'s exact-reference random.sample would
                    # raise ValueError — but only when this class first
                    # appears as a target, possibly hours in; surface the
                    # shortfall at construction instead.  Classes that can
                    # never be a target only warn.
                    msg = (f'{osp.join(support_dir, name)} has '
                           f'{len(files)} support images but '
                           f'num_shot={num_shot}; the reference protocol '
                           f'samples without replacement')
                    if cls_ind in reachable:
                        raise ValueError(msg)
                    warnings.warn(msg + ' (class never sampled as a '
                                  'target in this roidb; continuing)')
                self._paths[cls_ind] = files
            pool = None
        else:
            pool = ResamplingSupportPool(classes, num_shot,
                                         support_roidb=support_roidb,
                                         seed=seed)
        self.num_shot = num_shot
        super().__init__(roidb, pool, **kw)
        if self._paths is not None:
            self.skip_supports = True    # assembled in __getitem__

    def target_class(self, index):
        if self._paths is None:
            return super().target_class(index)
        # reference: seeded k=1 sample over first-appearance class order
        import random as _pyrandom
        seen = []
        for c in self.roidb[index]['gt_classes']:
            if int(c) and int(c) not in seen:
                seen.append(int(c))
        return int(_pyrandom.Random(0).sample(seen, k=1)[0])

    def __getitem__(self, index):
        if self._paths is None:
            self.pool.reseed(index)   # fresh, deterministic per item
            return super().__getitem__(index)
        import random as _pyrandom
        item = super().__getitem__(index)
        cls = int(item['target_cls'])
        # reference rebuilds gt to ONLY the chosen class's boxes
        # (allcls_fs_loader.py:94-99; it also returns num_boxes=0 —
        # we keep the filtered count, a documented deviation since our
        # consumers read num_boxes for the valid-row prefix)
        entry = self.roidb[index]
        scale = item['im_info'][2]
        sel = entry['gt_classes'] == cls
        gt = np.zeros((self.max_num_box, 5), np.float32)
        n = min(int(sel.sum()), self.max_num_box)
        gt[:n, :4] = entry['boxes'][sel][:n] * scale
        gt[:n, 4] = cls
        item['gt_boxes'] = gt
        item['num_boxes'] = np.int32(n)
        picks = _pyrandom.Random(index).sample(
            self._paths[cls], k=self.num_shot)
        item['support_ims'] = np.stack([
            blob.support_blob_whole(blob.imread_bgr(p), self.pixel_means,
                                    self.pool_support_size)
            for p in picks])
        return item

    @property
    def pool_support_size(self):
        return self.pool.support_size if self.pool is not None else 320
