import numpy as np
import jax.numpy as jnp

from dana_tpu.ops.nms import batched_nms_fixed, nms_fixed, nms_fixed_tiled


def greedy_nms_py(boxes, scores, thresh):
    """Plain-python greedy NMS with the reference's +1 IoU and > thresh
    suppression (mirrors csrc/cpu/nms_cpu.cpp:6-75)."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if scores[j] > scores[i]:
                continue
            ix1 = max(boxes[i, 0], boxes[j, 0])
            iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2])
            iy2 = min(boxes[i, 3], boxes[j, 3])
            w = max(0.0, ix2 - ix1 + 1)
            h = max(0.0, iy2 - iy1 + 1)
            inter = w * h
            a_i = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
            a_j = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            iou = inter / (a_i + a_j - inter)
            if iou > thresh:
                suppressed[j] = True
    return keep


def _rand_boxes(rng, n, hi=400):
    x1 = rng.uniform(0, hi, n)
    y1 = rng.uniform(0, hi, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_nms_matches_greedy_reference():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 200
        boxes = _rand_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        ref = greedy_nms_py(boxes, scores, 0.5)
        idx, mask = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
        got = np.asarray(idx)[np.asarray(mask)]
        np.testing.assert_array_equal(got, ref)


def test_nms_max_output_truncation():
    rng = np.random.RandomState(1)
    boxes = _rand_boxes(rng, 100)
    scores = rng.rand(100).astype(np.float32)
    ref = greedy_nms_py(boxes, scores, 0.7)
    k = max(1, len(ref) // 2)
    idx, mask = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.7, k)
    assert mask.sum() == k
    np.testing.assert_array_equal(np.asarray(idx), ref[:k])


def test_nms_respects_valid_mask():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110], [1, 1, 11, 11]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.95], np.float32)
    valid = np.array([True, False, True])
    idx, mask = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3,
                          jnp.asarray(valid))
    got = np.asarray(idx)[np.asarray(mask)]
    # box 1 excluded by valid; box 2 beats box 0, which it suppresses
    np.testing.assert_array_equal(got, [2])


def test_nms_identical_boxes():
    boxes = np.tile(np.array([[10., 10., 50., 50.]], np.float32), (8, 1))
    scores = np.linspace(0.1, 0.9, 8).astype(np.float32)
    idx, mask = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 8)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, [7])  # only the top-scored survives


def test_tiled_nms_matches_reference():
    rng = np.random.RandomState(4)
    for n, tile, k in [(200, 64, 200), (500, 128, 60), (130, 64, 20)]:
        boxes = _rand_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        ref = greedy_nms_py(boxes, scores, 0.5)[:k]
        idx, mask = nms_fixed_tiled(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.5, k, tile=tile)
        got = np.asarray(idx)[np.asarray(mask)]
        np.testing.assert_array_equal(got, ref)


def test_tiled_nms_valid_mask_and_early_exit():
    rng = np.random.RandomState(5)
    boxes = _rand_boxes(rng, 300)
    scores = rng.rand(300).astype(np.float32)
    valid = rng.rand(300) > 0.3
    ref = greedy_nms_py(boxes[valid], scores[valid], 0.6)
    ref_idx = np.where(valid)[0][ref][:16]
    idx, mask = nms_fixed_tiled(jnp.asarray(boxes), jnp.asarray(scores),
                                0.6, 16, jnp.asarray(valid), tile=64)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, ref_idx)


def test_batched_nms_shapes():
    rng = np.random.RandomState(2)
    boxes = np.stack([_rand_boxes(rng, 64) for _ in range(3)])
    scores = rng.rand(3, 64).astype(np.float32)
    idx, mask = batched_nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 32)
    assert idx.shape == (3, 32) and mask.shape == (3, 32)
    for b in range(3):
        ref = greedy_nms_py(boxes[b], scores[b], 0.5)[:32]
        got = np.asarray(idx[b])[np.asarray(mask[b])]
        np.testing.assert_array_equal(got, ref)
