"""grid_sample / affine RoI crop vs torch (the POOLING_MODE='crop' STN
path, net_utils.py:87-194)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dana_tpu.ops.grid_sample import affine_grid, grid_sample, \
    roi_crop_pool  # noqa: E402


def test_grid_sample_matches_torch():
    gen = torch.Generator().manual_seed(0)
    feat = torch.randn(2, 3, 9, 11, generator=gen)
    grid = (torch.rand(2, 5, 6, 2, generator=gen) * 2.4 - 1.2)
    ref = F.grid_sample(feat, grid, mode='bilinear', padding_mode='zeros',
                        align_corners=True)
    got = grid_sample(jnp.asarray(feat.permute(0, 2, 3, 1).numpy()),
                      jnp.asarray(grid.numpy()))
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


def test_affine_grid_matches_torch():
    gen = torch.Generator().manual_seed(1)
    theta = torch.randn(3, 2, 3, generator=gen) * 0.5
    ref = F.affine_grid(theta, (3, 1, 7, 9), align_corners=True)
    got = affine_grid(jnp.asarray(theta.numpy()), (7, 9))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_roi_crop_pool_shape_and_content():
    feat = jnp.arange(1 * 8 * 8 * 2, dtype=jnp.float32).reshape(1, 8, 8, 2)
    rois = jnp.array([[[0.0, 16.0, 16.0, 112.0, 112.0]]])  # feature 1..7
    out = roi_crop_pool(feat, rois, output_size=4, spatial_scale=1 / 16.0)
    assert out.shape == (1, 1, 4, 4, 2)
    # crop of a linear ramp stays within the roi's value range
    sub = np.asarray(feat[0, 1:8, 1:8, 0])
    got = np.asarray(out[0, 0, ..., 0])
    assert got.min() >= sub.min() - 1e-3 and got.max() <= sub.max() + 1e-3
