"""RoIPool (max pooling per bin) via separable masked maxes.

Replaces /root/reference/lib/model/csrc/cuda/ROIPool_cuda.cu (max with
argmax backward). Bins are axis-aligned rectangles, so the 2-D masked max
factorizes: first a masked max over W per x-bin, then a masked max over H
per y-bin — VPU passes with static shapes. The backward comes from
autodiff of max (subgradient to the argmax element, like the CUDA kernel).

The x-bin pass is unrolled over the (static, small) pooled dimension and
rois are processed in chunks via lax.map so peak memory stays at
[chunk, H, W, C] rather than [R, P, H, W, C].

Bin boundary arithmetic matches the kernel: floor/ceil of
(p * roi_extent / pooled) offset by the rounded roi start, clamped.
Shipped configs use POOLING_MODE='align' (cfgs/res50.yml:35); this op
exists for API/behavior parity with POOLING_MODE='pool'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_masks(lo_r, hi_r, size: int, pooled: int):
    """[R, pooled, size] boolean bin-membership masks for one axis.

    Bin edges are computed in EXACT integer arithmetic: the float
    formulation floor/ceil(p * extent / pooled) is fragile at integer
    boundaries — XLA may rewrite the division as a reciprocal multiply,
    turning e.g. ceil(7 * (6/7)) into ceil(6.0000005) = 7 under jit and
    silently widening bins (caught by the full-forward RoIPool A/B,
    tests/test_reference_ab.py)."""
    start = jnp.round(lo_r).astype(jnp.int32)
    end = jnp.round(hi_r).astype(jnp.int32)
    extent = jnp.maximum(end - start + 1, 1)                # [R]
    p = jnp.arange(pooled, dtype=jnp.int32)
    scaled = p[None, :] * extent[:, None]                   # [R,P]
    b_start = scaled // pooled + start[:, None]
    b_end = (scaled + extent[:, None] + pooled - 1) // pooled \
        + start[:, None]                                    # ceil-div
    b_start = jnp.clip(b_start, 0, size)
    b_end = jnp.clip(b_end, 0, size)
    u = jnp.arange(size, dtype=jnp.int32)
    return (u[None, None, :] >= b_start[..., None]) & \
           (u[None, None, :] < b_end[..., None])            # [R,P,size]


@functools.partial(jax.jit, static_argnames=('output_size', 'roi_chunk'))
def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray, output_size: int = 7,
             spatial_scale: float = 1.0 / 16.0, roi_chunk: int = 32) -> jnp.ndarray:
    """Max RoI pooling over batched NHWC features.

    feat [B, H, W, C]; rois [B, R, 4|5] (batch-index column ignored).
    Returns [B, R, P, P, C]. Empty bins produce 0 (kernel's maxval=0 init).
    R must be a multiple of roi_chunk (pad rois if needed).
    """
    if rois.shape[-1] == 5:
        rois = rois[..., 1:5]
    B, H, W, C = feat.shape
    R = rois.shape[1]
    P = output_size
    chunk = min(roi_chunk, R)
    assert R % chunk == 0, f'R={R} not a multiple of roi_chunk={chunk}'
    neg = jnp.asarray(-jnp.inf, jnp.float32)

    def per_image(f, r):
        f32 = f.astype(jnp.float32)
        r = r.astype(jnp.float32) * spatial_scale
        my = _axis_masks(r[:, 1], r[:, 3], H, P)             # [R,P,H]
        mx = _axis_masks(r[:, 0], r[:, 2], W, P)             # [R,P,W]

        def one_chunk(args):
            mxc, myc = args                                   # [chunk,P,W/H]
            # stage 1: masked max over W for each x-bin q (unrolled, small P)
            cols = []
            for q in range(P):
                m = mxc[:, q, None, :, None]                  # [chunk,1,W,1]
                cols.append(jnp.where(m, f32[None], neg).max(axis=2))  # [chunk,H,C]
            tmp = jnp.stack(cols, axis=1)                     # [chunk,Q,H,C]
            # stage 2: masked max over H for each y-bin p
            mh = myc[:, None, :, :, None]                     # [chunk,1,P,H,1]
            th = jnp.where(mh, tmp[:, :, None, :, :], neg)    # [chunk,Q,P,H,C]
            out = th.max(axis=3)                              # [chunk,Q,P,C]
            return jnp.transpose(out, (0, 2, 1, 3))           # [chunk,P,Q,C]

        out = jax.lax.map(one_chunk,
                          (mx.reshape(R // chunk, chunk, P, W),
                           my.reshape(R // chunk, chunk, P, H)))
        out = out.reshape(R, P, P, C)
        return jnp.where(jnp.isfinite(out), out, 0.0).astype(feat.dtype)

    return jax.vmap(per_image)(feat, rois)
