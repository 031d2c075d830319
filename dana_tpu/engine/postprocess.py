"""Detection post-processing: delta decode + class-agnostic NMS, jitted.

Parity: /root/reference/inference.py:113-142 — bbox delta denormalization
by BBOX_NORMALIZE_STDS/MEANS, bbox_transform_inv + clip, rescale to raw
image coordinates, score threshold 0.05, NMS (TEST.NMS=0.3), top
max_per_image=100 — but batched and fixed-shape on device (the reference
loops images on the host at bs=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dana_tpu.core.boxes import clip_boxes, decode_boxes
from dana_tpu.ops.nms import nms_fixed


# thresholds/stats are STATIC: they arrive as Python floats/tuples from
# config and must key the jit cache (a traced float would silently bake
# the first call's value; a non-static arg would be fine but these are
# compile-time constants anyway — static keeps XLA free to fold them).
@functools.partial(jax.jit,
                   static_argnames=('bbox_stds', 'bbox_means',
                                    'score_thresh', 'nms_thresh',
                                    'max_per_image'))
def postprocess_batch(rois, cls_prob, bbox_pred, im_info,
                      bbox_stds=(0.1, 0.1, 0.2, 0.2),
                      bbox_means=(0.0, 0.0, 0.0, 0.0),
                      score_thresh: float = 0.05, nms_thresh: float = 0.3,
                      max_per_image: int = 100):
    """-> (dets [B, max_per_image, 5] (x1, y1, x2, y2, score) in raw-image
    coords, valid [B, max_per_image])."""
    stds = jnp.asarray(bbox_stds, jnp.float32)
    means = jnp.asarray(bbox_means, jnp.float32)
    deltas = bbox_pred.astype(jnp.float32) * stds + means
    boxes = decode_boxes(rois[..., 1:5].astype(jnp.float32), deltas)
    boxes = clip_boxes(boxes, im_info[:, None, :2])
    boxes = boxes / im_info[:, None, 2:3]
    scores = cls_prob[..., 1].astype(jnp.float32)

    def per_image(b, s):
        valid = s > score_thresh
        idx, mask = nms_fixed(b, s, nms_thresh, max_per_image, valid)
        out = jnp.concatenate([b[idx], s[idx][:, None]], axis=-1)
        return jnp.where(mask[:, None], out, 0.0), mask

    return jax.vmap(per_image)(boxes, scores)
