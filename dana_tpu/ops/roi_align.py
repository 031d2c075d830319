"""RoIAlign as separable interpolation matmuls (TPU-native).

Replaces the reference CUDA kernel (/root/reference/lib/model/csrc/cuda/
ROIAlign_cuda.cu: bilinear_interpolate:15-61, RoIAlignForward:64+) and its
atomic-add backward. Key observation: bilinear sampling weights factorize
per axis, and averaging over a bin's sample grid factorizes too, so

    pooled[r, ph, pw, c] = sum_h sum_w Wy[r, ph, h] * Wx[r, pw, w] * feat[h, w, c]

with closed-form weight matrices Wy/Wx built from the roi coordinates.
RoIAlign is then two batched matmuls on the MXU — static shapes, exact
adaptive-sampling-count semantics (sampling_ratio=0 => ceil(roi/bin)
samples, like the CUDA kernel), and the backward pass is just the
transposed matmuls via autodiff (no scatter-add kernel needed).

Feature layout is NHWC (TPU-native), rois are in input-image coordinates
(x1, y1, x2, y2) scaled by `spatial_scale` like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_weights(lo, hi, size: int, pooled: int, max_samples: int,
                  sampling_ratio: int):
    """Interpolation weight matrix for one axis.

    Args:
      lo, hi: [R] roi start/end in feature coordinates (already scaled).
      size: static feature extent (H or W).
      pooled: static output bins.
      max_samples: static cap on samples per bin.
      sampling_ratio: 0 for adaptive ceil(roi_extent/pooled), else fixed.

    Returns: [R, pooled, size] weights (each row sums to 1 for in-range bins).
    """
    extent = jnp.maximum(hi - lo, 1.0)                      # [R]
    bin_sz = extent / pooled                                # [R]
    if sampling_ratio > 0:
        count = jnp.full_like(extent, sampling_ratio)
    else:
        # CUDA adaptive ceil(extent/pooled) — but NOT via jnp.ceil of
        # the division: XLA rewrites /pooled as a reciprocal multiply
        # and ceil(21 * (1/7)) compiles to ceil(3.0000002) = 4 under
        # jit.  floor + exact-product correction is rewrite-immune
        # (q*pooled is exact in f32 at these magnitudes).
        q = jnp.floor(extent / pooled)
        count = q + (q * pooled < extent)
    count = jnp.clip(count, 1, max_samples)

    p = jnp.arange(pooled, dtype=lo.dtype)                  # [P]
    s = jnp.arange(max_samples, dtype=lo.dtype)             # [S]
    # sample coordinate: lo + p*bin + (s+.5)*bin/count
    x = (lo[:, None, None] + p[None, :, None] * bin_sz[:, None, None]
         + (s[None, None, :] + 0.5) * (bin_sz / count)[:, None, None])  # [R,P,S]
    smask = s[None, None, :] < count[:, None, None]         # [R,1,S] mask

    # bilinear_interpolate clamp semantics (ROIAlign_cuda.cu:15-45):
    # out of [-1, size] -> zero contribution; x<0 -> 0; x_low >= size-1 ->
    # x_low = x_high = size-1 with fractional part 0.
    in_range = (x >= -1.0) & (x <= size)
    xc = jnp.clip(x, 0.0, None)
    x_low = jnp.clip(jnp.floor(xc), None, size - 1)
    frac = jnp.where(x_low >= size - 1, 0.0, xc - x_low)
    x_high = jnp.clip(x_low + 1, None, size - 1)

    w = jnp.where(smask & in_range, 1.0, 0.0) / count[:, None, None]
    u = jnp.arange(size, dtype=lo.dtype)                    # [size]
    # scatter hat weights onto the axis grid via one-hot comparisons
    low_oh = (u[None, None, None, :] == x_low[..., None])
    high_oh = (u[None, None, None, :] == x_high[..., None])
    contrib = (low_oh * (w * (1.0 - frac))[..., None]
               + high_oh * (w * frac)[..., None])           # [R,P,S,size]
    return contrib.sum(axis=2)                              # [R,P,size]


@functools.partial(
    jax.jit,
    static_argnames=('output_size', 'sampling_ratio', 'max_samples',
                     'int8'))
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, output_size: int = 7,
              spatial_scale: float = 1.0 / 16.0, sampling_ratio: int = 0,
              max_samples: int = 16, int8: bool = False) -> jnp.ndarray:
    """RoIAlign over batched NHWC features.

    Args:
      feat: [B, H, W, C].
      rois: [B, R, 4] or [B, R, 5] (batch-index column ignored; rois are
        grouped per image, matching how the proposal layer emits them).
      output_size: pooled bins per side (cfg.POOLING_SIZE).
      spatial_scale: image->feature coordinate scale (1/16).
      sampling_ratio: 0 = adaptive (reference behavior), >0 fixed.
      max_samples: static cap on adaptive samples per bin axis; 16 covers
        feature maps up to 16*output_size cells (MAX_SIZE 1200/16 = 75 < 112).
      int8: run the combined matmul on the int8 MXU path (inference
        serving only — jnp.round kills gradients): interpolation weights
        quantized per (roi, bin) row (exact row max preserves the hat
        shape), features per-tensor dynamically.  Measured 2.15x the
        bf16 dot at eval shapes (PERF.md round 3).

    Returns: [B, R, output_size, output_size, C].
    """
    if rois.shape[-1] == 5:
        rois = rois[..., 1:5]
    B, H, W, C = feat.shape
    dtype = feat.dtype

    # bf16 perf path: combine the two axis-weight matrices into one
    # [R, P*P, H*W] operand and hit the MXU with a single batched matmul.
    # The separable two-einsum path materializes an [R, P, W, C]
    # intermediate (~215 MB/image at eval shapes — measured 5.4 ms/batch
    # of pure HBM traffic); the combined form trades that for extra
    # MXU FLOPs, which are nearly free.  f32 keeps the separable path
    # with HIGHEST precision for CUDA-parity numerics.
    combine = dtype != jnp.float32

    def per_image(f, r):
        r = r.astype(jnp.float32) * spatial_scale
        wy = _axis_weights(r[:, 1], r[:, 3], H, output_size, max_samples,
                           sampling_ratio)                  # [R,P,H]
        wx = _axis_weights(r[:, 0], r[:, 2], W, output_size, max_samples,
                           sampling_ratio)                  # [R,P,W]
        if int8 and combine:
            # serving path: both operands int8, contraction on the int8
            # MXU.  Weight rows are quantized by their exact max (values
            # in [0, rowmax], so no clipping) and the per-row scale
            # factors back out of the contraction exactly.
            wcomb = jnp.einsum('rph,rqw->rpqhw', wy, wx)     # f32
            sw = jnp.maximum(jnp.max(jnp.abs(wcomb), axis=(3, 4)),
                             1e-8) / 127.0
            wq = jnp.round(wcomb / sw[..., None, None]).astype(jnp.int8)
            ff = f.astype(jnp.float32)
            sf = jnp.maximum(jnp.max(jnp.abs(ff)), 1e-8) / 127.0
            fq = jnp.clip(jnp.round(ff / sf), -127, 127).astype(jnp.int8)
            acc = jnp.einsum('rpqhw,hwc->rpqc', wq, fq,
                             preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32)
                    * (sw[..., None] * sf)).astype(dtype)
        if combine:
            wcomb = jnp.einsum('rph,rqw->rpqhw', wy, wx).astype(dtype)
            out = jnp.einsum(
                'rpqhw,hwc->rpqc', wcomb, f,
                preferred_element_type=jnp.float32).astype(dtype)
            return out
        wy = wy.astype(dtype)
        wx = wx.astype(dtype)
        # [R,P,H] x [H, W*C] -> [R,P,W,C]; then contract W per roi.
        # precision=highest: parity with the CUDA kernel's fp32 math — the
        # TPU default would run fp32 matmuls in bf16 passes.
        prec = jax.lax.Precision.HIGHEST
        tmp = jnp.einsum('rph,hwc->rpwc', wy, f, precision=prec,
                         preferred_element_type=jnp.float32).astype(dtype)
        out = jnp.einsum('rqw,rpwc->rpqc', wx, tmp, precision=prec,
                         preferred_element_type=jnp.float32).astype(dtype)
        return out

    return jax.vmap(per_image)(feat, rois)
