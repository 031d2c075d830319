"""Detection losses (masked, static-shape).

Parity sources: _smooth_l1_loss (/root/reference/lib/model/utils/
net_utils.py:71-85), the RPN masked cross-entropy (rpn.py:98-106), and the
1:2:1 fg / paired-bg / negative-support-bg hard-mining cross-entropy shared
by all episodic frameworks (dana.py:199-215, fsod.py:158-174).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1_loss(pred, targets, inside_w, outside_w, sigma=1.0,
                   reduce_dims=None):
    """Huber loss with the py-faster-rcnn sigma transition.

    inside_w/outside_w broadcast against pred.  `reduce_dims` are summed
    (reference dim=[1,2,3] / [1,2]); the remaining leading axis is meaned.
    """
    sigma2 = sigma * sigma
    diff = inside_w * (pred - targets)
    adiff = jnp.abs(diff)
    flag = (adiff < 1.0 / sigma2).astype(pred.dtype)
    loss = flag * 0.5 * sigma2 * diff * diff + \
        (1.0 - flag) * (adiff - 0.5 / sigma2)
    loss = outside_w * loss
    if reduce_dims is None:
        reduce_dims = tuple(range(1, loss.ndim))
    return loss.sum(axis=reduce_dims).mean()


def masked_cross_entropy(logits, labels, mask):
    """Mean CE over mask-selected entries, flattened across the batch
    (matches F.cross_entropy on index_select'ed rows, rpn.py:101-106)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[..., None], axis=-1)[..., 0]
    m = mask.astype(logits.dtype)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def hard_mined_pair_ce(cls_logits, labels, neg_logits):
    """The shared episodic-framework 1:2:1 hard-mining loss
    (dana.py:204-215; identical in fsod.py:163-174, meta.py, fgn.py).

    Over the *whole flattened batch* (the reference concatenates the
    positive- and negative-branch rois into one [2M] index space):
      * every fg roi of the positive branch contributes CE(label 1);
      * the bg_num_0 = clamp(2*n_fg, 1, M/2) highest-fg-prob bg rois of
        the positive branch contribute CE(label 0);
      * the bg_num_1 = clamp(n_fg, 1, bg_num_0) highest-fg-prob rois of
        the negative-support branch contribute CE(label 0);
    mean over the selected rois.

    Args:
      cls_logits: [B, S, 2] positive-branch logits.
      labels: [B, S] int {0,1} proposal-target labels.
      neg_logits: [B, S, 2] negative-branch logits (all labeled 0).
    """
    m = labels.size                                        # = B*S
    logits = cls_logits.reshape(m, 2)
    neg = neg_logits.reshape(m, 2)
    lab = labels.reshape(m)

    logp = jax.nn.log_softmax(logits, axis=-1)
    neg_logp = jax.nn.log_softmax(neg, axis=-1)
    fg = lab > 0
    n_fg = fg.sum()

    # caps: rois_label.shape[0] in the reference is 2M (pos+neg concat)
    bg_num_0 = jnp.clip(2 * n_fg, 1, int(2 * m * 0.25))
    bg_num_1 = jnp.clip(n_fg, 1, bg_num_0)

    fg_prob = jax.nn.softmax(logits, axis=-1)[:, 1]
    bg_rank = _desc_rank(jnp.where(fg, -jnp.inf, fg_prob))
    bg_pick = (~fg) & (bg_rank < bg_num_0)

    neg_prob = jax.nn.softmax(neg, axis=-1)[:, 1]
    neg_pick = _desc_rank(neg_prob) < bg_num_1

    ce_fg = -logp[:, 1]
    ce_bg = -logp[:, 0]
    ce_neg = -neg_logp[:, 0]
    total = ((ce_fg * fg).sum() + (ce_bg * bg_pick).sum()
             + (ce_neg * neg_pick).sum())
    count = n_fg + bg_pick.sum() + neg_pick.sum()
    return total / jnp.maximum(count, 1)


def _desc_rank(x):
    """Rank (0 = largest) of each element along the last axis."""
    order = jnp.argsort(-x, axis=-1)
    return jnp.argsort(order, axis=-1)


def triplet_loss(anchor, positive, negative, margin=1.0, p=2):
    """Margin triplet loss.  The reference ships a syntactically-broken
    TripletLoss (lib/model/utils/losses.py:13, dead code); this is the
    working equivalent of what it attempts (torch TripletMarginLoss)."""
    def dist(a, b):
        return jnp.sum(jnp.abs(a - b) ** p, axis=-1) ** (1.0 / p)
    return jnp.maximum(dist(anchor, positive) - dist(anchor, negative)
                       + margin, 0.0).mean()
