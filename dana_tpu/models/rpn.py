"""Region Proposal Network stack, TPU-native.

Functional re-design of the reference RPN
(/root/reference/lib/model/rpn/rpn.py:17-117) and its target layers
(anchor_target_layer.py:31-219, proposal_target_layer_cascade.py:20-213,
proposal_layer.py:26-205).  Key differences from the reference, all in
service of static shapes and zero host round-trips:

  * The per-image Python NMS loop becomes one batched fixed-output NMS
    (ops/nms.py) under vmap.
  * The host-side numpy subsampling loops become masked random-rank
    selection under a threaded PRNG key (same sampling *distribution*:
    uniform without replacement for fg, the reference's with-replacement
    floor(rand*n) for proposal-target bg).
  * Everything carries (padded array, validity mask) pairs instead of
    dynamic lengths.

Channel conventions (NHWC): the cls head emits [B, H, W, 2A] where the
first A channels are bg and the last A are fg logits — the exact order of
the reference's [B, 2A, H, W] tensor under its view(B, 2, A*H, W) pairing
(rpn.py:49-56), so torch checkpoints convert without channel shuffles.
Flattened anchor order is (h, w, a), matching the reference grid
(proposal_layer.py:90-93).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dana_tpu.core.boxes import (clip_boxes, decode_boxes, encode_boxes,
                                 iou_matrix_masked)
from dana_tpu.models import layers as L
from dana_tpu.ops.nms import nms_fixed_tiled


def init_rpn_params(rng: np.random.Generator, din: int, num_anchors: int):
    """RPN conv heads (rpn.py:28-36); weight init normal(0, 0.01) truncated=
    False as in the frameworks' _init_weights (dana.py:222-238)."""
    return {
        'RPN_Conv': L.init_conv(rng, 3, 3, din, 512, bias=True, std=0.01),
        'RPN_cls_score': L.init_conv(rng, 1, 1, 512, num_anchors * 2,
                                     bias=True, std=0.01),
        'RPN_bbox_pred': L.init_conv(rng, 1, 1, 512, num_anchors * 4,
                                     bias=True, std=0.01),
    }


def rpn_forward(base_feat, params, num_anchors: int):
    """Conv heads -> (cls logits [B,N,2], fg probs [B,N], deltas [B,N,4]).

    N = H*W*A in (h, w, a) order.  Softmax pairing follows the reference
    bg=[0:A], fg=[A:2A] channel split (rpn.py:30-32,49-56).
    """
    b, h, w, _ = base_feat.shape
    a = num_anchors
    x = L.relu(L.conv2d(base_feat, params['RPN_Conv'], stride=1, padding=1))
    raw = L.conv2d(x, params['RPN_cls_score'], stride=1, padding='VALID')
    # [B,H,W,2A] -> [B,H,W,A,2]: stack (bg, fg) per anchor
    logits = jnp.stack([raw[..., :a], raw[..., a:]], axis=-1)
    logits = logits.reshape(b, h * w * a, 2)
    probs_fg = jax.nn.softmax(logits, axis=-1)[..., 1]
    deltas = L.conv2d(x, params['RPN_bbox_pred'], stride=1, padding='VALID')
    deltas = deltas.reshape(b, h * w * a, 4)
    return logits, probs_fg, deltas


def proposal_layer(probs_fg, deltas, anchors, im_info, *, pre_nms_top_n,
                   post_nms_top_n, nms_thresh, nms_cap=6000):
    """Decode + clip + top-k + NMS -> rois [B, post_nms_top_n, 5].

    Parity: _ProposalLayer.forward (proposal_layer.py:49-190; the min-size
    filter there is commented out and is omitted here too).  Column 0 is
    the batch index, padded slots are all-zero, and a validity mask is
    returned alongside (the reference encodes validity as zero padding).

    nms_cap bounds the O(n^2) suppression matrix; scores below the top
    `min(pre_nms_top_n, nms_cap)` are dropped before NMS (the reference
    TEST path uses 6000 already; for TRAIN's 12000 this is an explicit,
    logged approximation knob — cfg.TPU.NMS_MAX_INPUT).
    """
    n = probs_fg.shape[1]
    k = min(pre_nms_top_n, nms_cap, n)

    proposals = decode_boxes(anchors[None], deltas)
    proposals = clip_boxes(proposals, im_info[:, None, :2])

    def per_image(props, scores):
        top_scores, order = jax.lax.top_k(scores, k)
        boxes = props[order]
        idx, mask = nms_fixed_tiled(boxes, top_scores, nms_thresh,
                                    post_nms_top_n)
        out = jnp.where(mask[:, None], boxes[idx], 0.0)
        sc = jnp.where(mask, top_scores[idx], 0.0)
        return out, sc, mask

    boxes, scores, mask = jax.vmap(per_image)(proposals, probs_fg)
    batch_col = jnp.broadcast_to(
        jnp.arange(boxes.shape[0], dtype=boxes.dtype)[:, None, None],
        (*boxes.shape[:2], 1))
    rois = jnp.concatenate([batch_col, boxes], axis=-1)
    return rois, scores, mask


def _random_rank(key, mask):
    """Uniform-random rank of each True element among the True elements.

    rank[i] < limit selects `limit` elements uniformly without replacement.
    False elements get rank >= mask.sum().
    """
    r = jax.random.uniform(key, mask.shape)
    r = jnp.where(mask, r, jnp.inf)
    order = jnp.argsort(r, axis=-1)
    return jnp.argsort(order, axis=-1)


def anchor_target(anchors, gt_boxes, im_info, key, *, batch_rois=256,
                  fg_fraction=0.5, pos_overlap=0.7, neg_overlap=0.3,
                  clobber_positives=False, allowed_border=0):
    """RPN training targets, fully vectorized.

    Parity: _AnchorTargetLayer.forward (anchor_target_layer.py:60-199).
    Outside-image anchors keep label -1 (the reference's inds_inside
    filter + _unmap); subsampling replaces the host numpy permutation with
    jax.random ranks.  Note the reference computes the uniform
    1/num_examples outside-weight from the *last* image in its batch loop
    (anchor_target_layer.py:160-161 uses leaked loop var `i`); we compute
    it per image — both equal 1/RPN_BATCHSIZE whenever enough anchors
    exist.

    Returns labels [B,N] in {-1,0,1}, bbox_targets [B,N,4],
    inside_w [B,N], outside_w [B,N]; N in (h,w,a) order.
    """
    bsz = gt_boxes.shape[0]
    inside = ((anchors[:, 0] >= -allowed_border) &
              (anchors[:, 1] >= -allowed_border) &
              (anchors[:, 2] < im_info[:, None, 1] + allowed_border) &
              (anchors[:, 3] < im_info[:, None, 0] + allowed_border))  # [B,N]

    ov = iou_matrix_masked(anchors[None], gt_boxes)        # [B,N,G]
    ov = jnp.where(inside[..., None], ov, -1.0)
    max_ov = ov.max(axis=2)
    argmax_ov = ov.argmax(axis=2)
    gt_max = ov.max(axis=1)                                # [B,G]
    gt_max = jnp.where(gt_max == 0.0, 1e-5, gt_max)
    is_best = (ov == gt_max[:, None, :]).any(axis=2)       # best anchor per gt

    labels = jnp.full(max_ov.shape, -1, jnp.int32)
    if not clobber_positives:
        labels = jnp.where(max_ov < neg_overlap, 0, labels)
    labels = jnp.where(is_best, 1, labels)
    labels = jnp.where(max_ov >= pos_overlap, 1, labels)
    if clobber_positives:
        labels = jnp.where(max_ov < neg_overlap, 0, labels)
    labels = jnp.where(inside, labels, -1)

    num_fg = int(fg_fraction * batch_rois)
    kf, kb = jax.random.split(key)
    fg = labels == 1
    fg_keep = _random_rank(kf, fg) < num_fg
    labels = jnp.where(fg & ~fg_keep, -1, labels)

    n_fg = (labels == 1).sum(axis=1, keepdims=True)
    num_bg = batch_rois - n_fg                             # [B,1]
    bg = labels == 0
    bg_keep = _random_rank(kb, bg) < num_bg
    labels = jnp.where(bg & ~bg_keep, -1, labels)

    assigned_gt = jnp.take_along_axis(
        gt_boxes[..., :4], argmax_ov[..., None], axis=1)
    targets = encode_boxes(jnp.broadcast_to(anchors[None], assigned_gt.shape),
                           assigned_gt)
    targets = jnp.where(inside[..., None], targets, 0.0)

    inside_w = (labels == 1).astype(jnp.float32)
    num_examples = (labels >= 0).sum(axis=1, keepdims=True)
    outside_w = jnp.where(
        labels >= 0, 1.0 / jnp.maximum(num_examples, 1).astype(jnp.float32),
        0.0)
    return labels, targets, inside_w, outside_w


def iou_anchor_target(anchors, gt_boxes, im_info, key, **kw):
    """anchor_target + the per-anchor max-IoU map as a 5th output.

    Parity: _IOUAnchorTargetLayer (iou_anchor_target_layer.py:31-224) —
    not wired into any framework in the reference either, but part of the
    public API surface."""
    labels, targets, in_w, out_w = anchor_target(anchors, gt_boxes,
                                                 im_info, key, **kw)
    # the reference computes the IoU map over ALL anchors with no
    # inside-image filter (iou_anchor_target_layer.py:193-196)
    ov = iou_matrix_masked(anchors[None], gt_boxes)
    return labels, targets, in_w, out_w, ov.max(axis=2)


def proposal_target(rois, gt_boxes, key, *, rois_per_image=128,
                    fg_fraction=0.25, fg_thresh=0.5, bg_thresh_hi=0.5,
                    bg_thresh_lo=0.1, bbox_normalize_means=(0., 0., 0., 0.),
                    bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2)):
    """Sample 128 rois/img with <=25% fg + regression targets.

    Parity: _ProposalTargetLayer (proposal_target_layer_cascade.py:33-213):
    gt boxes are appended to the candidates; fg sampled uniformly without
    replacement, bg with replacement (the reference's floor(rand*n_bg));
    fg slots come first, labels beyond the fg count clamp to 0.  The
    all-fg / all-bg fallback branches (lines 168-188) are reproduced with
    lax.select logic; the raise on fg=bg=0 becomes an all-invalid output.

    Returns rois [B,S,5], labels [B,S] int32, bbox_targets [B,S,4],
    inside_w [B,S,4], outside_w [B,S,4].
    """
    bsz, _, _ = rois.shape
    fg_per_image = int(round(fg_fraction * rois_per_image)) or 1
    gt_as_rois = jnp.concatenate(
        [jnp.zeros((*gt_boxes.shape[:2], 1), rois.dtype),
         gt_boxes[..., :4]], axis=-1)
    all_rois = jnp.concatenate([rois, gt_as_rois], axis=1)   # [B,T,5]
    t = all_rois.shape[1]

    ov = iou_matrix_masked(all_rois[..., 1:5], gt_boxes)     # [B,T,G]
    max_ov = ov.max(axis=2)
    gt_assignment = ov.argmax(axis=2)
    labels_all = jnp.take_along_axis(gt_boxes[..., 4], gt_assignment, axis=1)

    fg_mask = max_ov >= fg_thresh
    bg_mask = (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo)
    n_fg = fg_mask.sum(axis=1)                               # [B]
    n_bg = bg_mask.sum(axis=1)

    kf, kb, kff, kbb = jax.random.split(key, 4)

    # fg without replacement: random-rank top fg_per_image
    fg_rank = _random_rank(kf, fg_mask)                      # [B,T]
    fg_order = jnp.argsort(jnp.where(fg_mask, fg_rank, t), axis=1)
    # with-replacement fallbacks (floor(rand * n))
    u_fg = jax.random.uniform(kff, (bsz, rois_per_image))
    u_bg = jax.random.uniform(kbb, (bsz, rois_per_image))
    bg_positions = jnp.argsort(jnp.where(bg_mask, 0, 1), axis=1,
                               stable=True)                  # bg indices first
    fg_positions = jnp.argsort(jnp.where(fg_mask, 0, 1), axis=1, stable=True)

    both = (n_fg > 0) & (n_bg > 0)
    only_fg = (n_fg > 0) & (n_bg == 0)
    only_bg = (n_fg == 0) & (n_bg > 0)
    valid_img = n_fg + n_bg > 0

    fg_count = jnp.where(
        both, jnp.minimum(fg_per_image, n_fg),
        jnp.where(only_fg, rois_per_image, 0))               # [B]

    s = jnp.arange(rois_per_image)
    is_fg_slot = s[None, :] < fg_count[:, None]              # [B,S]

    # fg slot s -> fg_order[s] (without replacement) in the `both` case,
    # fg_positions[floor(u*n_fg)] (with replacement) in the only_fg case.
    fg_wr = jnp.take_along_axis(
        fg_positions, (u_fg * n_fg[:, None]).astype(jnp.int32), axis=1)
    fg_sel = jnp.where(both[:, None], fg_order[:, :rois_per_image], fg_wr)

    bg_slot = (s[None, :] - fg_count[:, None]) % rois_per_image
    u_bg_s = jnp.take_along_axis(u_bg, bg_slot, axis=1)
    bg_sel = jnp.take_along_axis(
        bg_positions, (u_bg_s * jnp.maximum(n_bg, 1)[:, None]).astype(jnp.int32),
        axis=1)

    sel = jnp.where(is_fg_slot, fg_sel, bg_sel)              # [B,S]

    out_rois = jnp.take_along_axis(all_rois, sel[..., None], axis=1)
    out_rois = out_rois.at[..., 0].set(
        jnp.arange(bsz, dtype=out_rois.dtype)[:, None])
    labels = jnp.take_along_axis(labels_all, sel, axis=1)
    labels = jnp.where(is_fg_slot, labels, 0.0).astype(jnp.int32)
    labels = jnp.where(valid_img[:, None], labels, 0)

    sel_gt = jnp.take_along_axis(gt_assignment, sel, axis=1)
    gt_sel = jnp.take_along_axis(gt_boxes[..., :4], sel_gt[..., None], axis=1)
    targets = encode_boxes(out_rois[..., 1:5], gt_sel)
    means = jnp.asarray(bbox_normalize_means, targets.dtype)
    stds = jnp.asarray(bbox_normalize_stds, targets.dtype)
    targets = (targets - means) / stds

    pos = (labels > 0) & valid_img[:, None]
    targets = jnp.where(pos[..., None], targets, 0.0)
    inside_w = jnp.where(pos[..., None],
                         jnp.ones((4,), targets.dtype), 0.0)
    outside_w = (inside_w > 0).astype(targets.dtype)

    # images with neither fg nor bg (reference raises): mask everything out
    out_rois = jnp.where(valid_img[:, None, None], out_rois, 0.0)
    return out_rois, labels, targets, inside_w, outside_w
