"""Native host ops (C++ via ctypes) vs the jax device NMS and numpy."""

import numpy as np
import jax.numpy as jnp

from dana_tpu import native
from dana_tpu.ops.nms import nms_fixed


def _boxes(n=60, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_native_builds():
    assert native.available(), 'g++ build of host_ops failed'


def test_native_nms_matches_device_nms():
    boxes, scores = _boxes()
    keep_native = native.nms(boxes, scores, 0.5)
    idx, mask = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                          len(boxes))
    keep_device = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(keep_native, keep_device)


def test_native_nms_matches_numpy_fallback():
    boxes, scores = _boxes(seed=3)
    got = native.nms(boxes, scores, 0.4)
    ref = native._nms_np(boxes, scores, 0.4, len(boxes))
    np.testing.assert_array_equal(got, ref)


def test_native_overlaps_match_numpy():
    boxes, _ = _boxes(seed=1)
    query, _ = _boxes(20, seed=2)
    got = native.bbox_overlaps(boxes, query)
    ref = native._bbox_overlaps_np(boxes[:, :4], query[:, :4])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
