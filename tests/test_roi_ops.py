import numpy as np
import jax
import jax.numpy as jnp

from dana_tpu.ops.roi_align import roi_align
from dana_tpu.ops.roi_pool import roi_pool


def bilinear_interpolate_ref(data, h, w, y, x):
    """Scalar bilinear interpolation, mirroring ROIAlign_cuda.cu:15-45."""
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (hy * hx * data[y_low, x_low] + hy * lx * data[y_low, x_high]
            + ly * hx * data[y_high, x_low] + ly * lx * data[y_high, x_high])


def roi_align_ref(feat_hwc, roi, pooled, scale, sampling_ratio=0):
    """Python port of the CUDA RoIAlignForward loop (ROIAlign_cuda.cu:64+)."""
    H, W, C = feat_hwc.shape
    x1, y1, x2, y2 = [r * scale for r in roi]
    roi_w = max(x2 - x1, 1.0)
    roi_h = max(y2 - y1, 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled
    out = np.zeros((pooled, pooled, C), np.float32)
    for c in range(C):
        data = feat_hwc[:, :, c]
        for ph in range(pooled):
            for pw in range(pooled):
                gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_h / pooled))
                gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_w / pooled))
                acc = 0.0
                for iy in range(gh):
                    y = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        x = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += bilinear_interpolate_ref(data, H, W, y, x)
                out[ph, pw, c] = acc / (gh * gw)
    return out


def test_roi_align_matches_cuda_semantics():
    rng = np.random.RandomState(0)
    H, W, C = 16, 20, 3
    feat = rng.randn(1, H, W, C).astype(np.float32)
    rois = np.array([[0, 8.0, 12.0, 150.0, 200.0],
                     [0, 0.0, 0.0, 319.0, 255.0],
                     [0, 100.0, 50.0, 120.0, 70.0],
                     [0, 30.0, 30.0, 33.0, 34.0]], np.float32)[None]
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, 0))
    for r in range(rois.shape[1]):
        ref = roi_align_ref(feat[0], rois[0, r, 1:], 7, 1 / 16.0)
        np.testing.assert_allclose(got[0, r], ref, rtol=1e-4, atol=1e-5)


def test_roi_align_fixed_sampling_ratio():
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 12, 12, 2).astype(np.float32)
    rois = np.array([[0, 16.0, 16.0, 100.0, 120.0]], np.float32)[None]
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, 2))
    ref = roi_align_ref(feat[0], rois[0, 0, 1:], 7, 1 / 16.0, sampling_ratio=2)
    np.testing.assert_allclose(got[0, 0], ref, rtol=1e-4, atol=1e-5)


def test_roi_align_batched_and_differentiable():
    rng = np.random.RandomState(2)
    feat = rng.randn(2, 10, 10, 4).astype(np.float32)
    rois = np.tile(np.array([[0, 10., 10., 80., 80.]], np.float32), (2, 8, 1))

    def loss(f):
        return roi_align(f, jnp.asarray(rois), 7, 1 / 16.0).sum()

    g = jax.grad(loss)(jnp.asarray(feat))
    assert g.shape == feat.shape
    # each pooled output is an average of weights summing to 1 per bin;
    # total gradient mass = n_rois * 49 per image
    np.testing.assert_allclose(np.asarray(g).sum(), 2 * 8 * 49 * 4, rtol=1e-3)


def test_roi_pool_max_semantics():
    # single ramp channel: max of each bin is its bottom-right corner
    H = W = 14
    feat = (np.arange(H * W, dtype=np.float32).reshape(1, H, W, 1))
    rois = np.array([[0, 0.0, 0.0, float(W * 16 - 1), float(H * 16 - 1)]],
                    np.float32)[None]
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0))
    assert got.shape == (1, 1, 7, 7, 1)
    # global max must appear in the last bin
    assert got[0, 0, 6, 6, 0] == feat.max()
    # monotone ramp: bins are increasing along both axes
    g = got[0, 0, :, :, 0]
    assert np.all(np.diff(g, axis=0) > 0) and np.all(np.diff(g, axis=1) > 0)


def test_roi_pool_small_roi():
    rng = np.random.RandomState(3)
    feat = rng.randn(1, 8, 8, 2).astype(np.float32)
    # roi smaller than one feature cell -> all bins see that cell
    rois = np.array([[0, 33.0, 33.0, 34.0, 34.0]], np.float32)[None]
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0,
                              roi_chunk=1))
    np.testing.assert_allclose(got[0, 0], np.broadcast_to(feat[0, 2, 2], (7, 7, 2)))


def test_roi_align_adaptive_count_at_integer_boundary():
    """Rois spanning an EXACT multiple of the pooled size must use
    ceil(extent/pooled) = extent/pooled samples per bin.  jnp.ceil of
    the division miscounts under jit: XLA rewrites /pooled into a
    reciprocal multiply and ceil(21 * (1/7)) -> ceil(3.0000002) = 4,
    silently changing the sampling grid vs ROIAlign_cuda.cu (regression
    for the floor+correction fix in ops/roi_align._axis_weights)."""
    rng = np.random.RandomState(7)
    H, W, C = 32, 32, 2
    feat = rng.randn(1, H, W, C).astype(np.float32)
    # feature-space extents exactly 21 and 14 (scale 1/16)
    rois = np.array([[0, 16.0, 32.0, 16.0 + 21 * 16, 32.0 + 14 * 16]],
                    np.float32)[None]
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               7, 1.0 / 16.0, 0))[0, 0]
    want = roi_align_ref(feat[0], rois[0, 0, 1:], 7, 1.0 / 16.0, 0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_roi_pool_bin_edges_at_integer_boundary():
    """RoIPool bin edges are exact integer arithmetic — the float
    floor/ceil(p*extent/pooled) formulation widened bins under jit
    (same XLA reciprocal rewrite; caught by the full-forward A/B)."""
    rng = np.random.RandomState(8)
    H, W, C = 16, 20, 2
    feat = rng.randn(1, H, W, C).astype(np.float32)
    # rounded extent 6 in x: the q=6 bin must be [14, 15), not [14, 16)
    rois = np.array([[0, 146.072, 65.19, 217.711, 99.577]],
                    np.float32)[None]
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                              7, 1.0 / 16.0))
    with jax.disable_jit():
        want = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                   7, 1.0 / 16.0))
    np.testing.assert_array_equal(got, want)
