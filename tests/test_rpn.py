"""Invariant tests for the RPN stack's static-shape target/proposal layers
(semantics of /root/reference/lib/model/rpn/*.py, re-designed for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dana_tpu.core.anchors import generate_anchors, shifted_anchors
from dana_tpu.models import rpn


def _anchors(fh=8, fw=10, scales=(8, 16, 32)):
    base = generate_anchors(scales=np.array(scales))
    return shifted_anchors(fh, fw, 16, base)


def test_proposal_layer_shapes_and_batch_col():
    fh, fw, a = 8, 10, 9
    n = fh * fw * a
    key = jax.random.PRNGKey(0)
    probs = jax.random.uniform(key, (2, n))
    deltas = jax.random.normal(key, (2, n, 4)) * 0.1
    im_info = jnp.array([[128.0, 160.0, 1.0]] * 2)
    rois, scores, mask = rpn.proposal_layer(
        probs, deltas, _anchors(fh, fw), im_info, pre_nms_top_n=200,
        post_nms_top_n=32, nms_thresh=0.7, nms_cap=200)
    assert rois.shape == (2, 32, 5)
    np.testing.assert_array_equal(np.asarray(rois[0, :, 0]), 0)
    np.testing.assert_array_equal(np.asarray(rois[1, :, 0])[np.asarray(mask[1])], 1)
    r = np.asarray(rois)
    m = np.asarray(mask)
    # kept boxes clipped to the image
    assert (r[..., 1][m] >= 0).all() and (r[..., 3][m] <= 159).all()
    # scores are descending among valid
    s0 = np.asarray(scores[0])[m[0]]
    assert (np.diff(s0) <= 1e-6).all()


def test_anchor_target_counts_and_masks():
    fh, fw = 8, 10
    # small anchor scales so plenty of anchors fit inside the 128x160 image
    anchors = _anchors(fh, fw, scales=(1, 2, 4))
    gt = jnp.zeros((2, 4, 5))
    gt = gt.at[0, 0].set(jnp.array([20.0, 20.0, 90.0, 90.0, 1.0]))
    gt = gt.at[0, 1].set(jnp.array([5.0, 5.0, 40.0, 60.0, 1.0]))
    gt = gt.at[1, 0].set(jnp.array([30.0, 10.0, 120.0, 100.0, 1.0]))
    im_info = jnp.array([[128.0, 160.0, 1.0]] * 2)
    labels, targets, in_w, out_w = rpn.anchor_target(
        anchors, gt, im_info, jax.random.PRNGKey(1), batch_rois=64)
    labels = np.asarray(labels)
    # sampled set is exactly 64 per image (enough anchors exist)
    assert ((labels >= 0).sum(axis=1) == 64).all()
    # at most half fg
    assert ((labels == 1).sum(axis=1) <= 32).all()
    # every gt has at least one positive anchor
    assert (labels == 1).sum() > 0
    # outside-image anchors are ignored
    outside = ~np.asarray(
        (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
        & (anchors[:, 2] < 160) & (anchors[:, 3] < 128))
    assert (labels[:, outside] == -1).all()
    # outside weights uniform over sampled set
    ow = np.asarray(out_w)
    np.testing.assert_allclose(ow[labels >= 0], 1.0 / 64, rtol=1e-6)
    assert (ow[labels == -1] == 0).all()
    # inside weights only on positives
    iw = np.asarray(in_w)
    assert (iw[labels != 1] == 0).all() and (iw[labels == 1] == 1).all()


def test_proposal_target_sampling():
    key = jax.random.PRNGKey(2)
    # build 40 rois: 10 near the gt (fg), 30 random low-overlap (bg)
    gt = jnp.zeros((1, 3, 5)).at[0, 0].set(
        jnp.array([40.0, 40.0, 100.0, 100.0, 1.0]))
    fg_rois = jnp.tile(jnp.array([[0.0, 42.0, 41.0, 99.0, 102.0]]), (10, 1))
    bg_rois = jnp.concatenate([
        jnp.zeros((30, 1)),
        jnp.array([[0.0, 0.0, 30.0, 30.0]]) + 3.0 * jnp.arange(30)[:, None]],
        axis=1)
    rois = jnp.concatenate([fg_rois, bg_rois])[None]
    out_rois, labels, targets, in_w, out_w = rpn.proposal_target(
        rois, gt, key, rois_per_image=16)
    labels = np.asarray(labels)
    assert out_rois.shape == (1, 16, 5)
    # 25% fg cap: exactly 4 fg slots (10 fg candidates available)
    assert (labels[0] == 1).sum() == 4
    # fg slots come first
    assert (labels[0][:4] == 1).all() and (labels[0][4:] == 0).all()
    # targets zero on bg, nonzero-normalized on fg
    t = np.asarray(targets[0])
    assert (t[4:] == 0).all()
    assert np.abs(t[:4]).sum() > 0
    iw = np.asarray(in_w[0])
    assert (iw[:4] == 1).all() and (iw[4:] == 0).all()


def test_proposal_target_gt_appended_as_fg():
    """Even when no proposal reaches fg overlap, the appended gt boxes are
    fg candidates (proposal_target_layer_cascade.py:39-43) — one fg slot,
    the rest drawn from the single bg roi."""
    key = jax.random.PRNGKey(3)
    gt = jnp.zeros((1, 2, 5)).at[0, 0].set(
        jnp.array([200.0, 200.0, 260.0, 260.0, 1.0]))
    rois = jnp.concatenate([
        jnp.zeros((8, 1)),
        jnp.array([[0.0, 0.0, 30.0, 30.0]]) + 5.0 * jnp.arange(8)[:, None]],
        axis=1)[None]
    # one bg roi: IoU vs gt ~= 0.15 (in [0.1, 0.5))
    rois = rois.at[0, 0].set(jnp.array([0.0, 170.0, 170.0, 230.0, 230.0]))
    out_rois, labels, _, in_w, _ = rpn.proposal_target(
        rois, gt, key, rois_per_image=8)
    labels = np.asarray(labels)
    assert (labels[0, :1] == 1).all() and (labels[0, 1:] == 0).all()
    iw = np.asarray(in_w[0])
    assert (iw[0] == 1).all() and (iw[1:] == 0).all()
