"""Episodic loader tests over the synthetic dataset (host-side only)."""

import numpy as np
import pytest

from dana_tpu.data.fs_loader import (EpisodicBatcher, FewShotLoader,
                                     build_support_db)
from dana_tpu.data.imdb import combined_roidb
from dana_tpu.data.inference_loader import (ALLCLSFSLoader, InferenceLoader,
                                            MultiwayLoader, SupportPool)


@pytest.fixture(scope='module')
def synth():
    imdb_, roidb, ratio_list, ratio_index = combined_roidb(
        'synth_train', training=False, use_flipped=False)
    return imdb_, roidb


def test_support_db_filters(synth):
    imdb_, roidb = synth
    db = build_support_db(roidb, imdb_.num_classes)
    total = sum(len(d) for d in db)
    assert total > 0
    assert len(db[0]) == 0  # background never in the DB
    for cls_entries in db:
        for info in cls_entries:
            b = info['box']
            w, h = b[2] - b[0], b[3] - b[1]
            assert w >= 64 and h >= 64 and w <= 2 * h and h <= 2 * w


def test_fewshot_episode_shapes_and_labels(synth):
    imdb_, roidb = synth
    loader = FewShotLoader(roidb, imdb_.num_classes, num_way=2, num_shot=3,
                           seed=1)
    item = loader[2]
    assert item['im_data'].shape[2] == 3
    assert item['support_ims'].shape == (6, 320, 320, 3)
    gt = item['gt_boxes']
    n = int(item['num_boxes'])
    assert (gt[:n, 4] == 1).all()              # labels remapped to 1
    assert (gt[n:] == 0).all()                 # zero padding
    # boxes inside the scaled image
    h, w, _ = item['im_info']
    assert (gt[:n, 2] <= w) .all() and (gt[:n, 3] <= h).all()
    # determinism
    item2 = loader[2]
    np.testing.assert_array_equal(item['gt_boxes'], item2['gt_boxes'])
    np.testing.assert_array_equal(item['support_ims'], item2['support_ims'])


def test_batcher_groups_buckets(synth):
    imdb_, roidb = synth
    loader = FewShotLoader(roidb, imdb_.num_classes, num_way=2, num_shot=2,
                           seed=1)
    batcher = EpisodicBatcher(loader, 4, shuffle=True, seed=0)
    batch = next(iter(batcher))
    assert batch['im_data'].shape[0] == 4
    assert batch['im_data'].ndim == 4


def test_inference_loader_target_class(synth):
    imdb_, roidb = synth
    pool = SupportPool(imdb_.classes, 2, support_roidb=roidb, seed=0)
    loader = InferenceLoader(roidb, pool)
    item = loader[0]
    assert item['support_ims'].shape == (2, 320, 320, 3)
    assert int(item['target_cls']) == int(roidb[0]['gt_classes'][0])
    # seeded pool is fixed
    pool2 = SupportPool(imdb_.classes, 2, support_roidb=roidb, seed=0)
    np.testing.assert_array_equal(pool.get(int(item['target_cls'])),
                                  pool2.get(int(item['target_cls'])))


def test_multiway_loader(synth):
    imdb_, roidb = synth
    pool = SupportPool(imdb_.classes, 2, support_roidb=roidb, seed=0)
    loader = MultiwayLoader(roidb, pool, num_way=3)
    item = loader[0]
    assert item['support_ims'].shape == (6, 320, 320, 3)   # way*shot
    assert len(item['selected_ways']) == 3
    present = int(roidb[0]['gt_classes'][0])
    assert present in item['selected_ways']


def test_empty_pool_class_excluded_and_loud(synth):
    """Episodes whose only class has an empty support pool are excluded by
    valid_indices/EpisodicBatcher; direct access fails loudly (VERDICT r1:
    real-COCO tail classes crash _sample_supports otherwise)."""
    imdb_, roidb = synth
    loader = FewShotLoader(roidb, imdb_.num_classes, num_way=2, num_shot=2,
                           seed=1)
    # blow away one class's pool; find an image whose ONLY class is that one
    victim = None
    for i, e in enumerate(roidb):
        cls = {int(c) for c in e['gt_classes'] if c != 0}
        if len(cls) == 1:
            victim = (i, cls.pop())
            break
    assert victim is not None
    idx, vcls = victim
    loader.support_db[vcls] = []
    assert idx not in loader.valid_indices()
    with pytest.raises(ValueError):
        loader[idx]
    with pytest.raises(ValueError):
        loader._sample_supports(vcls, np.random.default_rng(0))
    # batcher never yields the excluded index
    batcher = EpisodicBatcher(loader, 2, shuffle=False, seed=0,
                              drop_last=False)
    for b in batcher._index_batches():
        assert idx not in b


def test_oracle_loader_returns_gt(synth):
    from dana_tpu.data.inference_loader import OracleLoader
    imdb_, roidb = synth
    loader = OracleLoader(roidb, seed=7)
    item = loader[0]
    n = int(item['num_boxes'])
    assert n == min(len(roidb[0]['boxes']), loader.max_num_box) and n > 0
    gt = item['gt_boxes']
    # all-class labels preserved (no remap to 1)
    assert set(gt[:n, 4].astype(int)) <= set(
        int(c) for c in roidb[0]['gt_classes'])
    assert (gt[n:] == 0).all()
    assert 'support_ims' not in item          # query-only protocol
    # deterministic shuffle
    item2 = loader[0]
    np.testing.assert_array_equal(item['gt_boxes'], item2['gt_boxes'])


def test_allcls_loader_lazy_resample(synth):
    imdb_, roidb = synth
    loader = ALLCLSFSLoader(roidb, roidb, imdb_.classes, num_shot=2, seed=3)
    a1 = loader[0]
    a2 = loader[0]
    np.testing.assert_array_equal(a1['support_ims'], a2['support_ims'])
    # per-item reseed -> different items draw (almost surely) different sets
    b = loader[1]
    assert a1['support_ims'].shape == (2, 320, 320, 3)
    assert b['support_ims'].shape == (2, 320, 320, 3)
    # laziness: get() decodes only the requested class's shots
    calls = []
    orig = loader.pool.get

    def counting_get(cls_ind):
        calls.append(cls_ind)
        return orig(cls_ind)
    loader.pool.get = counting_get
    loader[2]
    assert len(calls) == 1        # one class decoded, not num_classes


def test_allcls_directory_mode_validates_shot_count(synth, tmp_path):
    """Directory mode fails at CONSTRUCTION when a class pool has fewer
    than num_shot images — the reference's sample-without-replacement
    would only raise when that class first appears as a target, possibly
    hours into the eval."""
    import cv2
    imdb_, roidb = synth
    sdir = tmp_path / 'supports'
    im = np.zeros((32, 32, 3), np.uint8)
    for name in imdb_.classes:
        if name == '__background__':
            continue
        d = sdir / name
        d.mkdir(parents=True)
        for k in range(3):
            cv2.imwrite(str(d / f's{k}.jpg'), im)
    with pytest.raises(ValueError, match='support images but num_shot'):
        ALLCLSFSLoader(roidb, classes=imdb_.classes, num_shot=5,
                       support_dir=str(sdir))
    # enough images -> constructs fine
    ALLCLSFSLoader(roidb, classes=imdb_.classes, num_shot=3,
                   support_dir=str(sdir))


def test_allcls_short_pool_warns_for_unreachable_class(tmp_path):
    """A short pool only hard-fails for classes the deterministic
    target-class rule can actually sample; others degrade to a warning
    so previously-runnable evals stay runnable (reference
    allcls_fs_loader.py:108 raises only when sampled; advisor r4)."""
    import cv2
    import warnings as _warnings
    classes = ('__background__', 'used', 'unused')
    # roidb only ever contains class 1 -> class 2 is never a target
    roidb = [{'gt_classes': np.array([1]),
              'boxes': np.array([[2, 2, 20, 20]], np.float32),
              'image': 'x.jpg', 'flipped': False}]
    sdir = tmp_path / 'supports'
    im = np.zeros((32, 32, 3), np.uint8)
    for name, count in (('used', 3), ('unused', 1)):
        d = sdir / name
        d.mkdir(parents=True)
        for k in range(count):
            cv2.imwrite(str(d / f's{k}.jpg'), im)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter('always')
        ALLCLSFSLoader(roidb, classes=classes, num_shot=3,
                       support_dir=str(sdir))
    assert any('never sampled as a target' in str(w.message) for w in rec)
    # but a short REACHABLE class still fails fast at construction
    with pytest.raises(ValueError, match='support images but num_shot'):
        ALLCLSFSLoader(roidb, classes=classes, num_shot=4,
                       support_dir=str(sdir))


def test_support_cache_exact(tmp_path, monkeypatch):
    """Decoded-support FIFO cache returns bit-identical episodes."""
    import numpy as np
    from dana_tpu.utils.config import cfg
    from dana_tpu.data.imdb import combined_roidb
    from dana_tpu.data.fs_loader import FewShotLoader
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    imdb, roidb, _, _ = combined_roidb('synth_train', training=True,
                                       use_flipped=False)
    warm = FewShotLoader(roidb, imdb.num_classes, num_way=2, num_shot=2,
                         seed=3)
    _ = [warm[i] for i in range(6)]          # populate the cache
    assert warm._sup_cache                    # something got cached
    monkeypatch.setitem(cfg.TPU, 'SUPPORT_CACHE', 0)
    cold = FewShotLoader(roidb, imdb.num_classes, num_way=2, num_shot=2,
                         seed=3)
    for i in range(6):
        a, b = warm[i], cold[i]
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_image_cache_lru_and_identity(tmp_path):
    """ImageCache: hits return the stored pixels bit-exactly, byte
    budget evicts LRU-first, cached decodes are immutable, and
    imread_bgr through the cache equals the uncached decode."""
    import cv2
    from dana_tpu.data import blob
    from dana_tpu.utils.config import cfg

    paths = []
    for k in range(3):
        p = str(tmp_path / f'im{k}.png')   # lossless: decode == pixels
        cv2.imwrite(p, np.full((64, 64, 3), 40 * k + 10, np.uint8))
        paths.append(p)

    cache = blob.ImageCache(cap_mb=1)      # 1 MB ~= 85 of these (12 KB)
    a = cv2.imread(paths[0], cv2.IMREAD_COLOR)
    cache.put(paths[0], a)
    hit = cache.get(paths[0])
    np.testing.assert_array_equal(hit, a)
    assert not hit.flags.writeable
    with pytest.raises(ValueError):
        hit[0, 0, 0] = 1

    tiny = blob.ImageCache(cap_mb=0)       # evicts everything oversized
    assert tiny.put(paths[0], a) is a      # too big to store: passthrough
    assert tiny.get(paths[0]) is None

    # LRU order: refresh im0, insert until budget forces an eviction —
    # im1 (least recent) must go first
    small = blob.ImageCache(cap_mb=1)
    small.cap_bytes = 2 * a.nbytes + 10
    im1 = cv2.imread(paths[1], cv2.IMREAD_COLOR)
    im2 = cv2.imread(paths[2], cv2.IMREAD_COLOR)
    small.put(paths[0], a)
    small.put(paths[1], im1)
    assert small.get(paths[0]) is not None   # im0 now most-recent
    small.put(paths[2], im2)                 # evicts im1
    assert small.get(paths[1]) is None
    assert small.get(paths[0]) is not None
    assert small.get(paths[2]) is not None

    # end-to-end: cached imread_bgr == cold imread_bgr
    cfg.TPU.IMAGE_CACHE_MB = 64
    blob.clear_image_cache()
    first = blob.imread_bgr(paths[0])
    second = blob.imread_bgr(paths[0])      # hit path
    assert first is not second              # always a fresh f32 array
    np.testing.assert_array_equal(first, second)
    cfg.TPU.IMAGE_CACHE_MB = 0
    blob.clear_image_cache()
    cold = blob.imread_bgr(paths[0])
    np.testing.assert_array_equal(cold, second)
    assert cold.dtype == second.dtype == np.float32


def test_fewshot_episodes_identical_with_image_cache(synth):
    """Episodes are bit-identical with the decoded-image cache on/off."""
    from dana_tpu.data import blob
    from dana_tpu.utils.config import cfg
    imdb_, roidb = synth

    cfg.TPU.IMAGE_CACHE_MB = 0
    blob.clear_image_cache()
    off = FewShotLoader(roidb, imdb_.num_classes, num_way=2, num_shot=2,
                        seed=11)
    ref = [off[i] for i in range(4)]

    cfg.TPU.IMAGE_CACHE_MB = 256
    blob.clear_image_cache()
    on = FewShotLoader(roidb, imdb_.num_classes, num_way=2, num_shot=2,
                       seed=11)
    for i in range(4):          # twice: second pass rides cache hits
        for _pass in range(2):
            item = on[i]
            for k in ref[i]:
                np.testing.assert_array_equal(ref[i][k], item[k])
    blob.clear_image_cache()


def test_inference_loader_skip_supports(synth):
    """Cached-support serving (DAnA/cisa) never reads per-item support
    stacks — skip_supports must drop both the dict key and the decode
    work (code-review r3: assemble discarded them after the copy)."""
    imdb_, roidb = synth
    pool = SupportPool(imdb_.classes, 2, support_roidb=roidb, seed=0)
    loader = InferenceLoader(roidb, pool, skip_supports=True)
    item = loader[0]
    assert 'support_ims' not in item
    assert 'im_data' in item and 'target_cls' in item


def test_caches_thread_safe_under_contention(tmp_path):
    """FIFOCache and ImageCache under N threads of mixed get/put: no
    lost updates, no exceptions, eviction bounds hold (EpisodicBatcher
    workers share both caches)."""
    import threading
    import cv2
    from dana_tpu.data import blob

    fifo = blob.FIFOCache(cap=16)
    img = blob.ImageCache(cap_mb=1)
    paths = []
    for k in range(8):
        p = str(tmp_path / f'c{k}.png')
        cv2.imwrite(p, np.full((32, 32, 3), 10 * k, np.uint8))
        paths.append(p)
    decoded = {p: cv2.imread(p, cv2.IMREAD_COLOR) for p in paths}
    errors = []

    def worker(tid):
        rng = np.random.default_rng(tid)
        try:
            for i in range(400):
                k = int(rng.integers(0, 32))
                hit = fifo.get(k)
                if hit is None:
                    hit = fifo.put(k, np.full((4,), k, np.float32))
                assert hit[0] == k      # value always matches its key
                p = paths[int(rng.integers(0, len(paths)))]
                arr = img.get(p)
                if arr is None:
                    arr = img.put(p, decoded[p])
                np.testing.assert_array_equal(arr, decoded[p])
        except Exception as e:          # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(fifo._d) <= 16
    assert img._bytes <= img.cap_bytes
    assert img._bytes == sum(a.nbytes for a in img._d.values())
