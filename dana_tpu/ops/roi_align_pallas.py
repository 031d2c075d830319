"""RoIAlign forward as a Pallas TPU kernel.

The XLA formulations of ops/roi_align.py stream large interpolation
intermediates through HBM (separable: [R,P,W,C] ~215 MB/image; combined:
a [R,P^2,HW] weight operand).  This kernel keeps everything in VMEM:
grid (B, R/RB); per step it loads the image's full stride-16 feature map
(38x50x1024 bf16 ~ 3.9 MB), builds the combined bilinear weight matrix
for a block of RB rois on the VPU, and issues one [RB*P^2, HW] x [HW, C]
MXU matmul.  HBM traffic collapses to feat-once + outputs.

Semantics match ops/roi_align.py (adaptive sampling_ratio=0, CUDA clamp
rules, +1-free roi edges).

STATUS — measured on v5e at eval shapes ([8,38,50,1024] bf16, 300 rois):
XLA separable 5.4 ms, XLA combined-weights 4.05 ms, this kernel 11.95 ms.
The in-kernel one-hot weight construction ([RB,P,S,size] comparisons on
the VPU per grid step) dominates and loses to XLA's fused build.  The
"future work" variant below (roi_align_pallas_pw: XLA-precomputed axis
weights, kernel keeps only the two VMEM-resident matmuls) was built and
measured in round 4: 9.6 ms at roi_block=8, and larger blocks cannot
compile (the f32 [RB,P,W,C] stage-1 tmp exceeds VMEM at RB=16) — the
6x-fewer-FLOP separable geometry loses to lane-pad waste (K=38 vs 1900)
and half-idle systolic rows (M=64/step).  Both kernels are kept as
working reference implementations with the measured-negative writeup in
PERF.md ("RoIAlign locality blocking"); ops/roi_align.py's dense
combined path is the production route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _axis_weights_k(lo, hi, size: int, pooled: int, max_samples: int,
                    sampling_ratio: int):
    """[RB, pooled, size] interpolation weights (kernel-side build;
    mirrors ops/roi_align._axis_weights with broadcasted iota)."""
    extent = jnp.maximum(hi - lo, 1.0)
    bin_sz = extent / pooled
    if sampling_ratio > 0:
        count = jnp.full_like(extent, float(sampling_ratio))
    else:
        # floor + exact-product correction, NOT ceil of the division:
        # the compiler's reciprocal-multiply rewrite makes
        # ceil(21 * (1/7)) = 4 (see ops/roi_align.py)
        q = jnp.floor(extent / pooled)
        count = q + (q * pooled < extent)
    count = jnp.clip(count, 1, max_samples)

    rb = lo.shape[0]
    shape = (rb, pooled, max_samples)
    # Mosaic iota must be integer-typed; cast after
    p = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    s = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)
    x = (lo[:, None, None] + p * bin_sz[:, None, None]
         + (s + 0.5) * (bin_sz / count)[:, None, None])     # [RB,P,S]
    smask = s < count[:, None, None]

    in_range = (x >= -1.0) & (x <= size)
    xc = jnp.clip(x, 0.0, None)
    x_low = jnp.clip(jnp.floor(xc), None, size - 1)
    frac = jnp.where(x_low >= size - 1, 0.0, xc - x_low)
    x_high = jnp.clip(x_low + 1, None, size - 1)
    w = jnp.where(smask & in_range, 1.0, 0.0) / count[:, None, None]

    u = jax.lax.broadcasted_iota(jnp.int32, (rb, pooled, max_samples,
                                             size), 3).astype(jnp.float32)
    low_oh = (u == x_low[..., None]).astype(jnp.float32)
    high_oh = (u == x_high[..., None]).astype(jnp.float32)
    contrib = (low_oh * (w * (1.0 - frac))[..., None]
               + high_oh * (w * frac)[..., None])
    return contrib.sum(axis=2)                              # [RB,P,size]


def _kernel(rois_ref, feat_ref, out_ref, *, h, w, c, pooled, rb,
            spatial_scale, sampling_ratio, max_samples):
    # Variant A (self-contained): builds weights on the VPU in-kernel.
    rois = rois_ref[0].astype(jnp.float32) * spatial_scale  # [RB, 4]
    f = feat_ref[0]                                          # [H, W, C]
    wy = _axis_weights_k(rois[:, 1], rois[:, 3], h, pooled, max_samples,
                         sampling_ratio)                     # [RB,P,H]
    wx = _axis_weights_k(rois[:, 0], rois[:, 2], w, pooled, max_samples,
                         sampling_ratio)                     # [RB,P,W]
    _matmul_body(wy, wx, f, out_ref)


def _kernel_pw(wy_ref, wx_ref, feat_ref, out_ref):
    # Variant B (production): weights precomputed by XLA, kernel is just
    # the two VMEM-resident matmuls.
    _matmul_body(wy_ref[0], wx_ref[0], feat_ref[0], out_ref)


def _matmul_body(wy, wx, f, out_ref):
    # Two reshape-free dot_generals (Mosaic rejects trailing-dim
    # reshapes): stage 1 contracts H, stage 2 contracts W with a batch
    # dim over rois; the [RB,P,W,C] tmp stays in VMEM.
    tmp = jax.lax.dot_general(
        wy.astype(f.dtype), f, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(f.dtype)
    out = jax.lax.dot_general(
        wx.astype(f.dtype), tmp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[0] = jnp.swapaxes(out, 1, 2).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('output_size', 'spatial_scale',
                                             'sampling_ratio',
                                             'max_samples', 'roi_block',
                                             'pooled_pad'))
def roi_align_pallas_pw(feat, rois, output_size: int = 7,
                        spatial_scale: float = 1.0 / 16.0,
                        sampling_ratio: int = 0, max_samples: int = 16,
                        roi_block: int = 8, pooled_pad: int = 8):
    """Precomputed-weights Pallas RoIAlign (forward only).

    The docstring's "future work" variant: XLA builds the axis weights
    (its fused one-hot build beat the in-kernel VPU build 3x), and the
    kernel keeps ONLY the two matmuls with the [RB,P,W,C] tmp resident
    in VMEM — the separable formulation's 7x-fewer FLOPs without its
    215 MB/image HBM intermediate, and without the combined path's
    [R,P^2,HW] weight operand ever existing.

    Mosaic notes (two lowering hazards found empirically):
    - the original attempt passed weights as [B, R, P, H] with
      (1, RB, P, H) blocks and hit "infer-vector-layout: unsupported
      shape cast" on the 4D->3D block squeeze.  Flattening (B, R)
      XLA-side to [B*R, P, H] makes every weight block rank-preserving.
    - the kernel's first dot_general collapses (RB, P) -> RB*P on its
      LHS; with P=7 that is vector<8x7x38xbf16> -> vector<56x38xbf16>,
      which Mosaic rejects (7 is not sublane-aligned).  The pooled axis
      is therefore zero-padded to `pooled_pad`=8 XLA-side (8x8x38 ->
      64x38 lowers cleanly); the pad rows multiply through as zeros and
      are sliced off the output.

    feat [B,H,W,C], rois [B,R,4|5] -> [B,R,P,P,C].
    """
    from dana_tpu.ops.roi_align import _axis_weights

    if rois.shape[-1] == 5:
        rois = rois[..., 1:5]
    b, h, w, c = feat.shape
    r = rois.shape[1]
    pad = (-r) % roi_block
    if pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((b, pad, 4), rois.dtype)], axis=1)
    rp = r + pad
    nblk = rp // roi_block
    p = output_size
    # round UP to a multiple of pooled_pad: any non-sublane-aligned p
    # (14, 21, ...) hits the same Mosaic collapse rejection as 7
    pp = -(-p // pooled_pad) * pooled_pad if pooled_pad > 1 else p

    def weights_one(rs):
        rs = rs.astype(jnp.float32) * spatial_scale
        wy = _axis_weights(rs[:, 1], rs[:, 3], h, p, max_samples,
                           sampling_ratio)                   # [RP,P,H]
        wx = _axis_weights(rs[:, 0], rs[:, 2], w, p, max_samples,
                           sampling_ratio)                   # [RP,P,W]
        return wy, wx

    wy, wx = jax.vmap(weights_one)(rois)                     # [B,RP,P,*]
    if pp > p:
        wy = jnp.concatenate(
            [wy, jnp.zeros((b, rp, pp - p, h), wy.dtype)], axis=2)
        wx = jnp.concatenate(
            [wx, jnp.zeros((b, rp, pp - p, w), wx.dtype)], axis=2)
    wy = wy.reshape(b * rp, pp, h).astype(feat.dtype)
    wx = wx.reshape(b * rp, pp, w).astype(feat.dtype)

    out = pl.pallas_call(
        _kernel_pw3,
        grid=(b, nblk),
        interpret=jax.default_backend() != 'tpu',
        in_specs=[
            pl.BlockSpec((roi_block, pp, h),
                         lambda i, j, nblk=nblk: (i * nblk + j, 0, 0)),
            pl.BlockSpec((roi_block, pp, w),
                         lambda i, j, nblk=nblk: (i * nblk + j, 0, 0)),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, roi_block, pp, pp, c),
                               lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rp, pp, pp, c), feat.dtype),
    )(wy, wx, feat)
    return out[:, :r, :p, :p]


def _kernel_pw3(wy_ref, wx_ref, feat_ref, out_ref):
    _matmul_body(wy_ref[...], wx_ref[...], feat_ref[0], out_ref)


@functools.partial(jax.jit, static_argnames=('output_size', 'spatial_scale',
                                             'sampling_ratio',
                                             'max_samples', 'roi_block'))
def roi_align_pallas(feat, rois, output_size: int = 7,
                     spatial_scale: float = 1.0 / 16.0,
                     sampling_ratio: int = 0, max_samples: int = 16,
                     roi_block: int = 8):
    """feat [B,H,W,C], rois [B,R,4|5] -> [B,R,P,P,C] (forward only)."""
    if rois.shape[-1] == 5:
        rois = rois[..., 1:5]
    b, h, w, c = feat.shape
    r = rois.shape[1]
    pad = (-r) % roi_block
    if pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((b, pad, 4), rois.dtype)], axis=1)
    rp = r + pad

    # NOTE: a variant that precomputes the axis weights in XLA and feeds
    # them as [1, RB, P, H] kernel inputs fails Mosaic lowering
    # ("infer-vector-layout: unsupported shape cast" on the 4D->3D block
    # squeeze, jax 0.8 era); the self-contained in-kernel build below
    # compiles and is kept as the reference kernel.
    p = output_size
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, pooled=p,
                          rb=roi_block, spatial_scale=spatial_scale,
                          sampling_ratio=sampling_ratio,
                          max_samples=max_samples),
        grid=(b, rp // roi_block),
        interpret=jax.default_backend() != 'tpu',
        in_specs=[
            pl.BlockSpec((1, roi_block, 4), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, roi_block, p, p, c),
                               lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rp, p, p, c), feat.dtype),
    )(rois, feat)
    return out[:, :r]
