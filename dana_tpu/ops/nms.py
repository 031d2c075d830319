"""Fixed-shape greedy NMS for TPU.

Replaces the reference's CUDA bitmask kernel + host scan
(/root/reference/lib/model/csrc/cuda/nms.cu:13-131) and CPU greedy loop
(csrc/cpu/nms_cpu.cpp:6-75) with an XLA formulation:

  1. sort boxes by score (invalid slots get -inf),
  2. build the strict-lower-triangular suppression matrix
     M[i, j] = IoU(i, j) >= thresh  for j < i  (j higher-scored),
  3. iterate keep <- NOT(M @ keep > 0) to its fixed point.

The fixed point of (3) is exactly the greedy NMS result (each kept box is
kept iff no higher-scored *kept* box overlaps it); Jacobi iteration from
all-ones converges within the longest suppression-chain length, checked by
a lax.while_loop. Every step is one [N, N] x [N] matvec on the MXU —
no data-dependent shapes, no host round-trips.

IoU uses the legacy +1 convention to match the reference kernel
(nms.cu devIoU:13-21).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dana_tpu.core.boxes import iou_matrix


def _suppression_fixed_point(mask_f32: jnp.ndarray) -> jnp.ndarray:
    """keep <- ~(M @ keep > 0) until stable. mask_f32 strict lower tri.

    The body is applied 9x per while iteration (loop overhead dominates
    the tiny matvec); odd spacing is required for the convergence check —
    the update is antitone, orbits have period <= 2, so equality across
    an odd number of applications certifies the fixed point."""
    n = mask_f32.shape[0]

    def apply_n(keep, n_apps=9):
        for _ in range(n_apps):
            keep = jnp.logical_not(
                mask_f32 @ keep.astype(jnp.float32) > 0.0)
        return keep

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        return apply_n(keep), keep, it + 9

    keep0 = jnp.ones((n,), dtype=bool)
    keep1 = apply_n(keep0)
    keep, _, _ = jax.lax.while_loop(cond, body, (keep1, keep0, jnp.int32(9)))
    return keep


@functools.partial(jax.jit, static_argnames=('max_output',))
def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold,
              max_output: int, valid: jnp.ndarray | None = None):
    """Greedy NMS with fixed output size.

    Args:
      boxes: [N, 4] x1y1x2y2.
      scores: [N].
      iou_threshold: scalar; boxes with IoU >= threshold against a kept
        higher-scored box are suppressed (matches the reference kernel's
        `> thresh` on overlap... nms.cu uses `> nms_overlap_thresh`; we use
        strictly-greater for exact parity).
      max_output: static output slot count.
      valid: optional [N] bool; False slots are ignored.

    Returns:
      (indices [max_output] int32 into the input arrays, score-descending,
       keep_mask [max_output] bool marking real outputs; padded slots
       hold index 0 and False).
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = scores if valid is None else jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s)                      # stable desc sort
    sboxes = boxes[order]
    svalid = jnp.isfinite(s[order]) if valid is not None else jnp.ones((n,), bool)

    iou = iou_matrix(sboxes, sboxes)
    tri = jnp.tril(jnp.ones((n, n), jnp.float32), k=-1)
    mask = jnp.where(iou > iou_threshold, tri, 0.0)
    # invalid boxes can never suppress others
    mask = mask * svalid.astype(jnp.float32)[None, :]

    keep = _suppression_fixed_point(mask) & svalid

    # compact the first max_output kept (they are already score-ordered)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1   # output slot per kept box
    slot = jnp.where(keep, rank, max_output)        # dropped -> overflow slot
    slot = jnp.minimum(slot, max_output)            # kept beyond cap -> overflow
    out_idx = jnp.zeros((max_output + 1,), jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode='drop')[:max_output]
    total = jnp.sum(keep.astype(jnp.int32))
    out_mask = jnp.arange(max_output) < jnp.minimum(total, max_output)
    out_idx = jnp.where(out_mask, out_idx, 0)
    return out_idx, out_mask


def batched_nms_fixed(boxes, scores, iou_threshold, max_output: int, valid=None):
    """vmap of nms_fixed over a leading batch axis."""
    fn = lambda b, s, v: nms_fixed(b, s, iou_threshold, max_output, v)
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    return jax.vmap(fn)(boxes, scores, valid)


@functools.partial(jax.jit, static_argnames=('max_output', 'tile'))
def nms_fixed_tiled(boxes, scores, iou_threshold, max_output: int,
                    valid=None, tile: int = 512):
    """Tiled greedy NMS — same result as nms_fixed, built for speed.

    nms_fixed materializes the [N, N] suppression matrix (at the 6000-box
    TEST cap that is 144 MB of HBM traffic *per fixpoint iteration* — it
    measured as 80% of DAnA inference time on a v5e).  This version scans
    score-sorted boxes in tiles: each tile is suppressed against the
    boxes already kept (IoU [tile, max_output]) and within itself
    (triangular fixpoint on [tile, tile]), then appended to the kept
    buffer; the scan exits early once max_output boxes are kept.
    O(N*(tile+max_output)) compute, O(tile^2) memory.

    Tile size is a pure perf knob (results are exact greedy NMS for any
    tile).  v5e sweep at N=6000, bs=8 (round 2): 512 is the optimum —
    0.44 ms to 300 kept / 2.28 ms to 2000 kept (256: 0.50/2.88;
    1024: 0.74/3.70; 2048: 2.21/-).
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = scores if valid is None else jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s)
    sboxes = boxes[order]
    svalid = jnp.isfinite(s[order]) if valid is not None \
        else jnp.ones((n,), bool)

    pad = (-n) % tile
    if pad:
        sboxes = jnp.concatenate(
            [sboxes, jnp.zeros((pad, 4), boxes.dtype)])
        svalid = jnp.concatenate([svalid, jnp.zeros((pad,), bool)])
        order = jnp.concatenate(
            [order, jnp.zeros((pad,), order.dtype)])
    num_tiles = (n + pad) // tile

    tri = jnp.tril(jnp.ones((tile, tile), jnp.float32), k=-1)

    def body(state):
        t, kept_boxes, kept_valid, kept_idx, count = state
        lo = t * tile
        tb = jax.lax.dynamic_slice(sboxes, (lo, 0), (tile, 4))
        tv = jax.lax.dynamic_slice(svalid, (lo,), (tile,))
        tidx = jax.lax.dynamic_slice(order, (lo,), (tile,))

        # suppression by already-kept boxes
        iou_k = iou_matrix(tb, kept_boxes)                 # [tile, M]
        sup0 = ((iou_k > iou_threshold) & kept_valid[None, :]).any(axis=1)

        # within-tile fixpoint: keep <- live & ~(M @ keep > 0).  The body
        # is UNROLLED 9x per while iteration: each application is a tiny
        # matvec, so XLA while-loop per-iteration overhead dominates
        # (traced at ~98% of DAnA inference time before unrolling) while
        # suppression chains in clustered RPN boxes run 50+ deep.  The
        # unroll count must be ODD: the update map is antitone, so its
        # orbits have period <= 2 and equality across an odd number of
        # applications certifies a genuine fixed point (even spacing
        # could alias a 2-cycle).
        iou_t = iou_matrix(tb, tb)
        mask = jnp.where(iou_t > iou_threshold, tri, 0.0)
        live = tv & ~sup0

        def apply_n(k, n=9):
            for _ in range(n):
                k = live & ~(mask @ k.astype(jnp.float32) > 0.0)
            return k

        def cond(c):
            k, prev, it = c
            return jnp.logical_and(jnp.any(k != prev), it < tile)

        def step(c):
            k, _, it = c
            return apply_n(k), k, it + 9

        k1 = apply_n(live)
        keep_t, _, _ = jax.lax.while_loop(cond, step,
                                          (k1, live, jnp.int32(9)))

        rank = jnp.cumsum(keep_t.astype(jnp.int32)) - 1
        slot = jnp.where(keep_t, count + rank, max_output)
        slot = jnp.minimum(slot, max_output)               # overflow -> drop
        kept_boxes = kept_boxes.at[slot].set(tb, mode='drop')
        kept_valid = kept_valid.at[slot].set(keep_t, mode='drop')
        kept_idx = kept_idx.at[slot].set(tidx.astype(jnp.int32),
                                         mode='drop')
        count = jnp.minimum(count + keep_t.sum(), max_output)
        return t + 1, kept_boxes, kept_valid, kept_idx, count

    def cond(state):
        t, _, _, _, count = state
        return jnp.logical_and(t < num_tiles, count < max_output)

    init = (jnp.int32(0),
            jnp.zeros((max_output, 4), boxes.dtype),
            jnp.zeros((max_output,), bool),
            jnp.zeros((max_output,), jnp.int32),
            jnp.int32(0))
    _, _, kept_valid, kept_idx, count = jax.lax.while_loop(cond, body, init)
    out_mask = jnp.arange(max_output) < count
    out_idx = jnp.where(out_mask, kept_idx, 0)
    return out_idx, out_mask
