"""Jitted postprocess: correctness + jit-cache hygiene.

Parity surface: /root/reference/inference.py:113-142 (delta denorm,
decode, clip, rescale, score thresh, NMS, top-100)."""

import numpy as np

import jax.numpy as jnp

from dana_tpu.engine.postprocess import postprocess_batch


def _toy_inputs(b=2, r=8):
    rng = np.random.default_rng(0)
    rois = np.zeros((b, r, 5), np.float32)
    rois[..., 1] = rng.uniform(0, 100, (b, r))
    rois[..., 2] = rng.uniform(0, 100, (b, r))
    rois[..., 3] = rois[..., 1] + rng.uniform(20, 60, (b, r))
    rois[..., 4] = rois[..., 2] + rng.uniform(20, 60, (b, r))
    cls_prob = rng.uniform(0, 1, (b, r, 2)).astype(np.float32)
    bbox_pred = rng.normal(0, 0.1, (b, r, 4)).astype(np.float32)
    im_info = np.array([[200.0, 200.0, 1.0]] * b, np.float32)
    return (jnp.asarray(rois), jnp.asarray(cls_prob),
            jnp.asarray(bbox_pred), jnp.asarray(im_info))


def test_postprocess_shapes_and_masking():
    rois, cls_prob, bbox_pred, im_info = _toy_inputs()
    dets, valid = postprocess_batch(rois, cls_prob, bbox_pred, im_info,
                                    max_per_image=10)
    assert dets.shape == (2, 10, 5) and valid.shape == (2, 10)
    dets, valid = np.asarray(dets), np.asarray(valid)
    # masked rows are zero; valid rows have score > thresh and sane boxes
    assert (dets[~valid] == 0).all()
    assert (dets[valid][:, 4] > 0.05).all()
    assert (dets[valid][:, 2] >= dets[valid][:, 0]).all()


def test_postprocess_no_recompile_same_thresholds():
    """Repeat calls with identical static thresholds must hit the jit
    cache (VERDICT r1 weakness 8: a config sweep must not silently
    recompile per call)."""
    args = _toy_inputs()
    kw = dict(score_thresh=0.05, nms_thresh=0.3, max_per_image=10)
    postprocess_batch(*args, **kw)
    n0 = postprocess_batch._cache_size()
    for _ in range(3):
        postprocess_batch(*args, **kw)
    assert postprocess_batch._cache_size() == n0
    # a different threshold value is a NEW cache entry (static arg), once
    postprocess_batch(*args, score_thresh=0.1, nms_thresh=0.3,
                      max_per_image=10)
    n1 = postprocess_batch._cache_size()
    assert n1 == n0 + 1
    postprocess_batch(*args, score_thresh=0.1, nms_thresh=0.3,
                      max_per_image=10)
    assert postprocess_batch._cache_size() == n1
