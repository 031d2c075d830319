"""Host episode-feed rate vs device demand, cache-cold (VERDICT r4 item 2).

The reference feeds its GPU with 8 DataLoader worker PROCESSES
(/root/reference/train.py:57-59, fs_loader.py:332); the rebuild feeds
the chip from EpisodicBatcher (thread workers + decoded caches).  The
question this tool answers with numbers: can THIS host assemble episodes
at least as fast as the chip consumes them at the bs8 training knee
(80.5 ms/step = 99.4 eps/s, PERF.md round 4), when the support pool is
large enough that the 256-entry crop FIFO misses constantly (real COCO:
60 classes x thousands of crops)?

Pool: 60 classes x --images source images (480x640 JPEG, ~5 boxes each)
=> thousands of distinct support crops, drawn uniformly, so the FIFO
hit rate is ~cap/pool.  Arms:

  A  cold         SUPPORT_CACHE=0    IMAGE_CACHE_MB=0     nw=0
  B  fifo-only    SUPPORT_CACHE=256  IMAGE_CACHE_MB=0     nw=0
                  (the r4 doomsday: large pool defeats the crop FIFO)
  C  +image-LRU   SUPPORT_CACHE=256  IMAGE_CACHE_MB=2048  nw=0
                  (r5 fix: support-crop SOURCE images recur heavily even
                  when crops don't; a hit costs crop+resize, not decode)
  D  +workers     arm C with --nw thread workers
                  (on a multi-core host this scales the residual decode
                  path; on THIS 1-core box it can only measure overhead)

Each arm runs --epochs epochs over the batcher at --bs; epoch 1 of arm C
fills the image cache (mixed), epoch 2+ is steady-state.  A final
decomposition times the uncacheable part alone (query decode+prep — a
one-pass stream on real COCO) and the per-crop hit/miss costs, so the
steady-state feed rate on a dataset too big for any cache is derivable:
  ms/episode ~= query_ms + 6 * crop_source_hit_ms   (sources cached)
  worst case  = query_ms + 6 * crop_miss_ms         (nothing cached)

Usage: python tools/loader_feed_bench.py [--images 600] [--bs 8]
       [--epochs 2] [--nw 4] [--episodes-per-epoch 480]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

DEVICE_EPS_BS8 = 99.4   # PERF.md round-4 train_batch_study, v5e bs8 knee
DEVICE_EPS_BS4 = 85.6   # reference-protocol bs4 point


def build_pool(root: str, num_images: int, num_classes: int = 60,
               seed: int = 0):
    """Synthetic COCO-shaped roidb: many classes, many crops.  JPEGs on
    disk so the decode cost is real; boxes >=96px so the support-DB size
    filter (>=64 after the reference rules) keeps most of them."""
    import cv2
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    roidb = []
    h, w = 480, 640
    for i in range(num_images):
        path = osp.join(root, f'feed_{i:06d}.jpg')
        if not osp.exists(path):
            im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(path, im)
        else:
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)  # keep stream
        n_box = int(rng.integers(3, 7))
        boxes, classes = [], []
        for _ in range(n_box):
            bw = int(rng.integers(96, 200))
            bh = int(rng.integers(96, min(200, int(bw * 1.9))))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            boxes.append([x1, y1, x1 + bw, y1 + bh])
            classes.append(int(rng.integers(1, num_classes + 1)))
        gt_classes = np.array(classes, np.int32)
        overlaps = np.zeros((n_box, num_classes + 1), np.float32)
        overlaps[np.arange(n_box), gt_classes] = 1.0
        roidb.append({
            'image': path, 'height': h, 'width': w, 'flipped': False,
            'boxes': np.array(boxes, np.float32), 'gt_classes': gt_classes,
            'gt_overlaps': overlaps,
        })
    return roidb, num_classes + 1


def run_arm(roidb, num_classes, *, sup_cache, image_mb, nw, bs, epochs,
            episodes_per_epoch, seed=3):
    from dana_tpu.data import blob
    from dana_tpu.data.fs_loader import EpisodicBatcher, FewShotLoader
    from dana_tpu.utils.config import cfg

    cfg.TPU.SUPPORT_CACHE = sup_cache
    cfg.TPU.IMAGE_CACHE_MB = image_mb
    blob.clear_image_cache()
    loader = FewShotLoader(roidb, num_classes, num_way=2, num_shot=3,
                           seed=seed)
    batcher = EpisodicBatcher(loader, bs, shuffle=True, seed=seed,
                              num_workers=nw)
    per_epoch = []
    n_batches = max(1, episodes_per_epoch // bs)
    for _ in range(epochs):
        t0 = time.perf_counter()
        n = 0
        for k, batch in enumerate(batcher):
            n += batch['im_data'].shape[0]
            if k + 1 >= n_batches:
                break
        dt = time.perf_counter() - t0
        per_epoch.append(n / dt)
    return per_epoch


def decomposition(roidb, num_classes, image_mb):
    """Per-stage host costs: the cache-story arithmetic."""
    from dana_tpu.data import blob
    from dana_tpu.data.fs_loader import FewShotLoader, build_support_db
    from dana_tpu.utils.config import cfg

    cfg.TPU.IMAGE_CACHE_MB = 0
    blob.clear_image_cache()

    # query decode+prep, always a miss (one-pass stream on real data)
    t0 = time.perf_counter()
    n_q = min(64, len(roidb))
    for e in roidb[:n_q]:
        im = blob.imread_bgr(e['image'])
        blob.query_blob(im, cfg.PIXEL_MEANS, 600, None)
    query_ms = 1e3 * (time.perf_counter() - t0) / n_q

    db = build_support_db(roidb, num_classes)
    crops = [info for pool in db for info in pool][:64]

    cfg.TPU.SUPPORT_CACHE = 0

    def crop_once(info):
        im = blob.imread_bgr(roidb[info['roidb_idx']]['image'])
        return blob.support_blob(im, info['box'], cfg.PIXEL_MEANS, 320)

    t0 = time.perf_counter()
    for info in crops:
        crop_once(info)
    crop_miss_ms = 1e3 * (time.perf_counter() - t0) / len(crops)

    cfg.TPU.IMAGE_CACHE_MB = image_mb
    blob.clear_image_cache()
    for info in crops:
        crop_once(info)             # warm the image LRU
    t0 = time.perf_counter()
    for info in crops:
        crop_once(info)             # source hit: crop+resize+mean only
    crop_srchit_ms = 1e3 * (time.perf_counter() - t0) / len(crops)

    # crop-FIFO hit (both caches): the fully-warm bound
    cfg.TPU.SUPPORT_CACHE = 256
    fs = FewShotLoader(roidb, num_classes, num_way=2, num_shot=3)
    for info in crops[:8]:
        fs._support_image(info, None)
    t0 = time.perf_counter()
    for _ in range(8):
        for info in crops[:8]:
            fs._support_image(info, None)
    crop_fifohit_ms = 1e3 * (time.perf_counter() - t0) / 64

    return {
        'query_ms': round(query_ms, 2),
        'crop_miss_ms': round(crop_miss_ms, 2),
        'crop_source_hit_ms': round(crop_srchit_ms, 2),
        'crop_fifo_hit_ms': round(crop_fifohit_ms, 3),
        'episode_ms_sources_cached': round(query_ms + 6 * crop_srchit_ms, 1),
        'episode_ms_nothing_cached': round(query_ms + 6 * crop_miss_ms, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=600)
    ap.add_argument('--bs', type=int, default=8)
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--nw', type=int, default=4)
    ap.add_argument('--episodes-per-epoch', type=int, default=480)
    ap.add_argument('--root', default='.scratch/feed_pool')
    args = ap.parse_args()

    roidb, num_classes = build_pool(args.root, args.images)
    n_crops = 0
    from dana_tpu.data.fs_loader import build_support_db
    n_crops = sum(len(p) for p in build_support_db(roidb, num_classes))
    print(f'pool: {len(roidb)} images, {num_classes - 1} classes, '
          f'{n_crops} support crops (FIFO cap 256 -> '
          f'~{256 / max(1, n_crops):.0%} hit rate)', flush=True)

    arms = {
        'A_cold': dict(sup_cache=0, image_mb=0, nw=0),
        'B_fifo_only': dict(sup_cache=256, image_mb=0, nw=0),
        'C_image_lru': dict(sup_cache=256, image_mb=2048, nw=0),
        'D_workers': dict(sup_cache=256, image_mb=2048, nw=args.nw),
        # FIFO sized to the pool (f32 crops are 1.2 MB each — RAM is the
        # cheap resource on TPU hosts): steady state becomes query-bound
        'E_pool_fifo': dict(sup_cache=n_crops + 1, image_mb=2048, nw=0),
    }
    out = {'device_eps_bs8': DEVICE_EPS_BS8, 'device_eps_bs4': DEVICE_EPS_BS4}
    for name, kw in arms.items():
        rates = run_arm(roidb, num_classes, bs=args.bs, epochs=args.epochs,
                        episodes_per_epoch=args.episodes_per_epoch, **kw)
        out[name] = [round(r, 1) for r in rates]
        steady = rates[-1]
        print(f'{name:14s} {kw}: ' + ' '.join(f'{r:7.1f}' for r in rates)
              + f' eps/s   (steady = {steady / DEVICE_EPS_BS8:.2f}x bs8 '
              f'device demand)', flush=True)

    out['decomposition'] = decomposition(roidb, num_classes, 2048)
    print('decomposition:', json.dumps(out['decomposition']), flush=True)
    os.makedirs('.scratch', exist_ok=True)
    with open('.scratch/loader_feed_bench.json', 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
