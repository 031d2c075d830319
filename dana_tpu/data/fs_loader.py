"""Episodic few-shot training loader.

Parity: /root/reference/lib/roi_data_layer/fs_loader.py:16-354, re-designed
for static TPU shapes:

  * The reference's per-batch aspect-ratio unification + random crop
    (fs_loader.py:39-53, 186-283) is replaced by padding each scaled query
    onto one of a small set of static bucket canvases (blob.DEFAULT_BUCKETS)
    — each bucket compiles once; batches group same-bucket images.
  * The support DB keeps the reference filters exactly: non-flipped
    entries, non-crowd boxes, both sides >= 64 px, aspect ratio <= 2
    (fs_loader.py:58-78).
  * Per-item RNG is a seeded default_rng(seed, index) stream instead of
    global `random` state — deterministic under parallel workers.

Each item is ONE episode: a query image, `shot` positive supports of one
class present in the query (gt filtered to that class, labels remapped to
1, fs_loader.py:286-291), and `shot` negative supports of an absent class.
"""

from __future__ import annotations

import threading
from queue import Queue

import numpy as np

from dana_tpu.data import blob


def build_support_db(roidb, num_classes, size_threshold=64):
    """class idx -> list of {'roidb_idx', 'box'} (fs_loader.py:58-78)."""
    db = [[] for _ in range(num_classes)]
    for roidb_idx, entry in enumerate(roidb):
        if entry.get('flipped'):
            continue
        overlaps = entry['gt_overlaps']
        overlaps = overlaps.toarray() if hasattr(overlaps, 'toarray') \
            else overlaps
        gt_inds = np.where((entry['gt_classes'] != 0)
                           & np.all(overlaps > -1.0, axis=1))[0]
        for i in gt_inds:
            box = entry['boxes'][i].astype(np.float32)
            cls = int(entry['gt_classes'][i])
            w, h = box[2] - box[0], box[3] - box[1]
            if w < size_threshold or h < size_threshold \
                    or w > 2 * h or h > 2 * w:
                continue
            db[cls].append({'roidb_idx': roidb_idx, 'box': box})
    return db


class FewShotLoader:
    def __init__(self, roidb, num_classes, training=True, num_way=2,
                 num_shot=5, max_num_box=20, seed=1996,
                 pixel_means=None, buckets=None,
                 scale=None, max_size=None, support_size=320,
                 allowed_classes=None):
        """allowed_classes: optional set of class indices the positive way
        may be drawn from (base/novel split training — the reference
        realizes this through separate annotation packs, coco60_train)."""
        from dana_tpu.utils.config import cfg
        buckets = buckets or [tuple(b) for b in cfg.TPU.SIZE_BUCKETS]
        scale = scale or (cfg.TRAIN.SCALES[0] if training
                          else cfg.TEST.SCALES[0])
        if max_size is None:
            # exact reference scaling ignores the long-side cap entirely
            # (the reference comments it out, blob.py:44-46)
            max_size = None if cfg.TPU.EXACT_QUERY_SCALE else \
                (cfg.TRAIN.MAX_SIZE if training else cfg.TEST.MAX_SIZE)
        self.roidb = roidb
        self.num_classes = num_classes
        self.training = training
        self.num_way = num_way
        self.num_shot = num_shot
        self.max_num_box = max_num_box
        self.seed = seed
        self.pixel_means = (pixel_means if pixel_means is not None
                            else cfg.PIXEL_MEANS)
        self.buckets = buckets
        self.scale = scale
        self.max_size = max_size
        self.support_size = support_size
        self.allowed_classes = (set(allowed_classes)
                                if allowed_classes is not None else None)
        self.support_db = build_support_db(roidb, num_classes)
        # decoded-support cache: support_blob is deterministic in
        # (roidb_idx, box) and the per-class pools are small, so the same
        # crops recur every few episodes — re-decoding them dominated
        # episode prep (~33 of 45 ms on a one-core host, PERF.md r3).
        # FIFO-bounded; cfg.TPU.SUPPORT_CACHE entries (0 disables).
        self._sup_cache = blob.FIFOCache(cfg.TPU.SUPPORT_CACHE)
        # resolved once so the cache never mixes crop pipelines
        self.exact_support = bool(cfg.TPU.EXACT_SUPPORT_SCALE)

    def _class_has_supports(self, cls: int) -> bool:
        return bool(self.support_db[cls])

    def valid_indices(self):
        """roidb indices usable as episodes (has an allowed positive class
        with a non-empty support pool)."""
        out = []
        for i, entry in enumerate(self.roidb):
            classes = {int(c) for c in entry['gt_classes'] if c != 0}
            if self.allowed_classes is not None:
                classes &= self.allowed_classes
            if any(self._class_has_supports(c) for c in classes):
                out.append(i)
        return out

    def __len__(self):
        return len(self.roidb)

    # -- helpers -----------------------------------------------------------
    def _read(self, entry):
        return blob.imread_bgr(entry['image'])

    def _support_image(self, info, rng):
        key = (int(info['roidb_idx']),
               tuple(float(v) for v in info['box'][:4]))
        hit = self._sup_cache.get(key)
        if hit is not None:
            return hit
        entry = self.roidb[info['roidb_idx']]
        im = self._read(entry)
        if self.exact_support:
            # reference pipeline: scale the source image first, crop the
            # int16-truncated scaled box, resize by the no-+1 extents
            # (fs_loader.py:113-138; blob.support_blob_exact docstring)
            # max_size=None unconditionally: the reference's
            # prep_im_for_blob never applies the long-side cap (it is
            # commented out at blob.py:46-47), regardless of the
            # query-scale mode — coupling this to EXACT_QUERY_SCALE
            # would silently break the bit-for-bit claim (advisor r3)
            made = blob.support_blob_exact(
                im, info['box'], self.pixel_means, self.support_size,
                target_size=self.scale, max_size=None)
        else:
            made = blob.support_blob(
                im, info['box'], self.pixel_means, self.support_size)
        return self._sup_cache.put(key, made)

    def _sample_supports(self, cls, rng, replace_ok=True):
        pool = self.support_db[cls]
        if not pool:
            raise ValueError(
                f'class {cls} has an empty support pool — episodes must be '
                f'drawn from valid_indices() (support-poor classes on real '
                f'COCO tails are expected; see build_support_db filters)')
        if len(pool) >= self.num_shot:
            idx = rng.choice(len(pool), self.num_shot, replace=False)
        else:
            idx = rng.choice(len(pool), self.num_shot, replace=True)
        return [self._support_image(pool[int(i)], rng) for i in idx]

    def bucket_of(self, index):
        """Static canvas this entry lands on (for batch grouping)."""
        e = self.roidb[index]
        h, w = e['height'], e['width']
        s = blob.query_scale(h, w, self.scale, self.max_size)
        return blob.pick_bucket(round(h * s), round(w * s), self.buckets)

    # -- episode assembly --------------------------------------------------
    def __getitem__(self, index):
        entry = self.roidb[index]
        rng = np.random.default_rng((self.seed, index))

        im = self._read(entry)
        im_data, im_info = blob.query_blob(
            im, self.pixel_means, self.scale, self.max_size,
            flipped=bool(entry.get('flipped')), buckets=self.buckets)
        scale = im_info[2]

        overlaps = entry['gt_overlaps']
        overlaps = overlaps.toarray() if hasattr(overlaps, 'toarray') \
            else overlaps
        gt_inds = np.where((entry['gt_classes'] != 0)
                           & np.all(overlaps > -1.0, axis=1))[0]
        gt = np.zeros((len(gt_inds), 5), np.float32)
        gt[:, :4] = entry['boxes'][gt_inds] * scale
        gt[:, 4] = entry['gt_classes'][gt_inds]
        rng.shuffle(gt)

        classes_in_query = sorted({int(c) for c in gt[:, 4]})
        eligible = [c for c in classes_in_query
                    if (self.allowed_classes is None
                        or c in self.allowed_classes)
                    and self._class_has_supports(c)]
        if not eligible:
            raise ValueError(
                f'roidb[{index}] has no positive class with supports '
                f'(classes {classes_in_query}); iterate valid_indices()')
        pos_cls = int(rng.choice(eligible))

        supports = np.zeros((self.num_way * self.num_shot,
                             self.support_size, self.support_size, 3),
                            np.float32)
        for i, s in enumerate(self._sample_supports(pos_cls, rng)):
            supports[i] = s
        if self.num_way > 1:
            absent = [c for c in range(1, self.num_classes)
                      if c not in classes_in_query
                      and self._class_has_supports(c)
                      and (self.allowed_classes is None
                           or c in self.allowed_classes)]
            neg_cls = int(rng.choice(absent)) if absent else pos_cls
            for i, s in enumerate(self._sample_supports(neg_cls, rng)):
                supports[self.num_shot + i] = s

        # fs gt: positive-class boxes only, label 1 (fs_loader.py:286-291)
        fs = gt[gt[:, 4] == pos_cls].copy()
        fs[:, 4] = 1.0

        def pad_boxes(b):
            out = np.zeros((self.max_num_box, 5), np.float32)
            valid = (b[:, 0] != b[:, 2]) & (b[:, 1] != b[:, 3])
            b = b[valid][:self.max_num_box]
            out[:len(b)] = b
            return out, len(b)

        fs_pad, num_boxes = pad_boxes(fs)
        gt_pad, _ = pad_boxes(gt)

        return {
            'im_data': im_data, 'im_info': im_info,
            'gt_boxes': fs_pad, 'num_boxes': np.int32(num_boxes),
            'support_ims': supports, 'all_gt_boxes': gt_pad,
            'pos_cls': np.int32(pos_cls),
        }


class FinetuneLoader(FewShotLoader):
    """Training-style loader whose supports come from the directory pool
    `<support_dir>/<class_name>/*.jpg` instead of the crop DB
    (/root/reference/lib/roi_data_layer/finetune_loader.py:99-149);
    always 2-way (positive + one absent-class negative)."""

    def __init__(self, roidb, num_classes, class_names, support_dir,
                 **kw):
        super().__init__(roidb, num_classes, **kw)
        import glob
        import os.path as osp
        self.support_files = {}
        for cls_ind, name in enumerate(class_names):
            if name == '__background__':
                continue
            files = sorted(glob.glob(osp.join(support_dir, name, '*')))
            if files:
                self.support_files[cls_ind] = files

    def _class_has_supports(self, cls: int) -> bool:
        return cls in self.support_files

    def _sample_supports(self, cls, rng, replace_ok=True):
        if cls not in self.support_files:
            raise ValueError(
                f'class {cls} has no support directory files — episodes '
                f'must be drawn from valid_indices()')
        files = self.support_files[cls]
        idx = rng.choice(len(files), self.num_shot,
                         replace=len(files) < self.num_shot)
        out = []
        for i in idx:
            path = files[int(i)]
            hit = self._sup_cache.get(path)
            if hit is not None:
                out.append(hit)
                continue
            im = blob.imread_bgr(path)
            # whole-image prep, bit-exact vs the reference's directory
            # pool path (finetune_loader.py:110-123 — same code as
            # inference_loader.py:95-109; blob.support_blob_whole)
            out.append(self._sup_cache.put(path, blob.support_blob_whole(
                im, self.pixel_means, self.support_size)))
        return out


class EpisodicBatcher:
    """Groups same-bucket episodes into batches (replaces the reference's
    ratio-grouped `sampler` + 8-worker torch DataLoader,
    fs_loader.py:332-354 / train.py:57-59) with optional
    background-thread prefetch and a worker pool for episode assembly."""

    def __init__(self, loader: FewShotLoader, batch_size, shuffle=True,
                 seed=0, drop_last=True, process_id=0, process_count=1,
                 num_workers=0, lookahead=2):
        """batch_size is the GLOBAL batch.  Under a multi-process runtime
        (jax.distributed; parallel.distributed) pass this process's rank
        and the process count: the batch index sequence is
        seed-deterministic and identical on every process, and each
        process materializes (decodes, crops) ONLY its contiguous row
        block [rank*B/P, (rank+1)*B/P) of every batch — together the
        ranks reconstruct exactly the single-process batches.

        num_workers > 1 assembles episodes on a thread pool — the
        TPU-native replacement for the reference's 8 DataLoader worker
        PROCESSES (train.py:57-59): cv2 imdecode/resize and the numpy
        crop math release the GIL, so threads scale the cache-cold
        decode path without per-process support caches going cold
        independently.  Episode content is index-deterministic
        (default_rng((seed, index)) per item), so worker parallelism
        cannot change WHAT is produced — only when (determinism pinned
        by tests/test_distributed.py).  `lookahead` extra batches are
        kept in flight so a straggler decode in batch k overlaps batch
        k+1's assembly."""
        if batch_size % max(1, process_count):
            raise ValueError(
                f'global batch {batch_size} must divide evenly over '
                f'{process_count} processes')
        self.loader = loader
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_id = process_id
        self.process_count = max(1, process_count)
        self.num_workers = int(num_workers)
        self.lookahead = max(1, int(lookahead))
        self._epoch = 0

    def _index_batches(self):
        groups = {}
        # only episodes whose query has a supported positive class — on
        # real COCO tails some images' classes have empty support pools
        for i in self.loader.valid_indices():
            groups.setdefault(self.loader.bucket_of(i), []).append(i)
        rng = np.random.default_rng((self.seed, self._epoch))
        batches = []
        for bucket, idxs in sorted(groups.items()):
            idxs = np.array(idxs)
            if self.shuffle:
                rng.shuffle(idxs)
            for s in range(0, len(idxs), self.batch_size):
                chunk = idxs[s:s + self.batch_size]
                if len(chunk) < self.batch_size:
                    if self.drop_last:
                        continue
                    # Cycle the bucket until the batch is FULL: a bucket
                    # smaller than batch_size would otherwise yield a short
                    # batch whose per-rank row blocks are unequal (or empty)
                    # under multi-process slicing in __iter__.
                    reps = int(np.ceil(self.batch_size / len(idxs)))
                    pad = np.tile(idxs, reps)[:self.batch_size - len(chunk)]
                    chunk = np.concatenate([chunk, pad])
                batches.append(list(chunk))
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def __iter__(self):
        self._epoch += 1
        per = self.batch_size // self.process_count
        lo = self.process_id * per
        rows = [b[lo:lo + per] for b in self._index_batches()]
        if self.num_workers <= 1:
            for batch_idx in rows:
                items = [self.loader[i] for i in batch_idx]
                yield {k: np.stack([it[k] for it in items])
                       for k in items[0]}
            return
        yield from self._iter_workers(rows)

    def _iter_workers(self, rows):
        """Thread-pool episode assembly, pipelined `lookahead` batches
        deep; batches yield in index order regardless of completion
        order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=self.num_workers,
                                thread_name_prefix='dana-episode')
        try:
            pending = deque()
            it = iter(rows)

            def submit_next():
                batch_idx = next(it, None)
                if batch_idx is not None:
                    pending.append(
                        [ex.submit(self.loader.__getitem__, i)
                         for i in batch_idx])

            for _ in range(1 + self.lookahead):
                submit_next()
            while pending:
                futs = pending.popleft()
                items = [f.result() for f in futs]
                submit_next()
                yield {k: np.stack([it_[k] for it_ in items])
                       for k in items[0]}
        finally:
            # abandonment mid-epoch (GeneratorExit) must not strand
            # worker threads on in-flight decodes
            ex.shutdown(wait=False, cancel_futures=True)

    def __len__(self):
        return len(self._index_batches())


def prefetch_to_device(iterator, size=2, device_put=None):
    """Background-thread prefetch: overlaps host episode assembly with
    device compute (the BASELINE north-star's double buffering)."""
    import jax
    put = device_put or jax.device_put
    q = Queue(maxsize=size)
    _end = object()

    def worker():
        for item in iterator:
            q.put(put(item))
        q.put(_end)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _end:
            return
        yield item
