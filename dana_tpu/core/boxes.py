"""Pure-jnp box math, batched over arbitrary leading axes.

Functional parity with the reference's torch box ops
(/root/reference/lib/model/rpn/bbox_transform.py:15-257), including the
legacy Faster R-CNN +1 width/height convention and the crowd-box (-1)
masking of bbox_overlaps_batch.  Everything here is shape-polymorphic in
leading axes and jit/vmap-friendly (no Python control flow on values).
"""

from __future__ import annotations

import jax.numpy as jnp


def _wh_ctr(boxes):
    """width/height (+1 convention) and center of [..., 4] x1y1x2y2 boxes."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return w, h, cx, cy


def encode_boxes(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Regression targets from example rois to gt rois.

    Parity: bbox_transform / bbox_transform_batch (bbox_transform.py:15,36).
    Both inputs are [..., 4]; broadcasting over leading axes is allowed.
    """
    ew, eh, ecx, ecy = _wh_ctr(ex_rois)
    gw, gh, gcx, gcy = _wh_ctr(gt_rois)
    dx = (gcx - ecx) / ew
    dy = (gcy - ecy) / eh
    dw = jnp.log(gw / ew)
    dh = jnp.log(gh / eh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply predicted deltas to boxes. Parity: bbox_transform_inv
    (bbox_transform.py:77-103). boxes [..., 4], deltas [..., 4k] with the
    (dx, dy, dw, dh) interleave of the reference."""
    w, h, cx, cy = _wh_ctr(boxes)
    dx = deltas[..., 0::4]
    dy = deltas[..., 1::4]
    dw = deltas[..., 2::4]
    dh = deltas[..., 3::4]

    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = jnp.exp(dw) * w[..., None]
    ph = jnp.exp(dh) * h[..., None]

    out = jnp.empty_like(deltas)
    out = out.at[..., 0::4].set(pcx - 0.5 * pw)
    out = out.at[..., 1::4].set(pcy - 0.5 * ph)
    out = out.at[..., 2::4].set(pcx + 0.5 * pw)
    out = out.at[..., 3::4].set(pcy + 0.5 * ph)
    return out


def clip_boxes(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clip [..., 4k] boxes to [0, W-1] x [0, H-1].

    Parity: clip_boxes (bbox_transform.py:125-133). `im_hw` is (..., 2)
    with (height, width), broadcast against the boxes' leading axes.
    """
    im_hw = jnp.asarray(im_hw)
    h = im_hw[..., 0][..., None]
    w = im_hw[..., 1][..., None]
    out = jnp.empty_like(boxes)
    out = out.at[..., 0::4].set(jnp.clip(boxes[..., 0::4], 0, w - 1))
    out = out.at[..., 1::4].set(jnp.clip(boxes[..., 1::4], 0, h - 1))
    out = out.at[..., 2::4].set(jnp.clip(boxes[..., 2::4], 0, w - 1))
    out = out.at[..., 3::4].set(jnp.clip(boxes[..., 3::4], 0, h - 1))
    return out


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of [..., N, 4] vs [..., K, 4] -> [..., N, K].

    Parity: bbox_overlaps (bbox_transform.py:136-166), +1 convention.
    """
    area_a = ((a[..., 2] - a[..., 0] + 1.0) * (a[..., 3] - a[..., 1] + 1.0))
    area_b = ((b[..., 2] - b[..., 0] + 1.0) * (b[..., 3] - b[..., 1] + 1.0))
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:4], b[..., None, :, 2:4])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / union


def iou_matrix_masked(anchors: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU with zero-area masking semantics of bbox_overlaps_batch
    (bbox_transform.py:168-257): entries for zero-area gt boxes (x2==x1 and
    y2==y1, i.e. padded slots) are set to 0; entries for zero-area anchors
    are then set to -1 (crowd-box convention; applied second, it wins on
    overlapping cells, matching the reference's masked_fill_ order).

    anchors [..., N, 4], gt_boxes [..., K, 4+] (extra columns ignored).
    """
    gt = gt_boxes[..., :4]
    ov = iou_matrix(anchors, gt)
    gt_zero = ((gt[..., 2] - gt[..., 0] + 1.0) == 1.0) & \
              ((gt[..., 3] - gt[..., 1] + 1.0) == 1.0)
    an_zero = ((anchors[..., 2] - anchors[..., 0] + 1.0) == 1.0) & \
              ((anchors[..., 3] - anchors[..., 1] + 1.0) == 1.0)
    ov = jnp.where(gt_zero[..., None, :], 0.0, ov)
    ov = jnp.where(an_zero[..., :, None], -1.0, ov)
    return ov
