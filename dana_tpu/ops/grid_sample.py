"""Bilinear grid sampling + affine RoI crop (the POOLING_MODE='crop' STN
path).

Parity: /root/reference/lib/model/utils/net_utils.py:87-194
(_crop_pool_layer / _affine_grid_gen / _affine_theta) and the legacy
roi_crop CUDA kernels (lib/model/roi_crop/src/roi_crop_cuda_kernel.cu) —
shipped configs use 'align' (cfgs/res50.yml:35), this exists for API
parity.  Implemented as gather + lerp, fully vectorized NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(feat, grid):
    """torch.nn.functional.grid_sample (bilinear, zero padding,
    align_corners=True semantics of torch 1.2).

    feat: [N, H, W, C]; grid: [N, Hg, Wg, 2] normalized (x, y) in [-1, 1].
    """
    n, h, w, c = feat.shape
    x = (grid[..., 0] + 1.0) * (w - 1) / 2.0
    y = (grid[..., 1] + 1.0) * (h - 1) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    def gather(yi, xi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c                       # [N, Hg, Wg]
        flat = feat.reshape(n, h * w, c)
        g = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1).reshape(*idx.shape, c)
        return jnp.where(inb[..., None], g, 0.0)

    wa = ((x1 - x) * (y1 - y))[..., None]
    wb = ((x1 - x) * (y - y0))[..., None]
    wc = ((x - x0) * (y1 - y))[..., None]
    wd = ((x - x0) * (y - y0))[..., None]
    return (wa * gather(y0, x0) + wb * gather(y1, x0)
            + wc * gather(y0, x1) + wd * gather(y1, x1))


def affine_grid(theta, out_hw):
    """torch F.affine_grid: theta [N, 2, 3] -> grid [N, H, W, 2]."""
    hh, ww = out_hw
    ys = jnp.linspace(-1.0, 1.0, hh)
    xs = jnp.linspace(-1.0, 1.0, ww)
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)        # [H, W, 3]
    return jnp.einsum('nij,hwj->nhwi', theta, base)  # [N, H, W, 2]


def roi_crop_pool(feat, rois, output_size=7, spatial_scale=1.0 / 16.0,
                  max_pool=True):
    """STN-style RoI crop (net_utils._crop_pool_layer:87-139): affine
    theta from the roi corners, grid of (2P x 2P) when max_pool, bilinear
    sample, then 2x2 max pool.

    feat [B, H, W, C]; rois [B, R, 5]. Returns [B, R, P, P, C].
    """
    import jax
    b, h, w, c = feat.shape
    r = rois.shape[1]
    boxes = rois[..., 1:5] * spatial_scale
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    # net_utils.py _affine_theta (affine_mode='xy'-equivalent, :168-193)
    zero = jnp.zeros_like(x1)
    theta = jnp.stack([
        jnp.stack([(x2 - x1) / (w - 1), zero,
                   (x1 + x2 - w + 1) / (w - 1)], axis=-1),
        jnp.stack([zero, (y2 - y1) / (h - 1),
                   (y1 + y2 - h + 1) / (h - 1)], axis=-1),
    ], axis=-2)                                        # [B, R, 2, 3]

    size = output_size * 2 if max_pool else output_size
    grid = affine_grid(theta.reshape(b * r, 2, 3), (size, size))
    feat_rep = jnp.repeat(feat, r, axis=0)             # [B*R, H, W, C]
    crops = grid_sample(feat_rep, grid)                # [B*R, s, s, C]
    if max_pool:
        crops = jax.lax.reduce_window(
            crops, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            'VALID')
    return crops.reshape(b, r, output_size, output_size, c)
