"""Native host ops (C++ via ctypes) vs the jax device NMS and numpy."""

import numpy as np
import jax.numpy as jnp

from dana_tpu import native
from dana_tpu.data import blob
from dana_tpu.ops.nms import nms_fixed


def _boxes(n=60, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_native_builds():
    assert native.available(), 'g++ build of host_ops failed'


def test_native_nms_matches_device_nms():
    boxes, scores = _boxes()
    keep_native = native.nms(boxes, scores, 0.5)
    idx, mask = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                          len(boxes))
    keep_device = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(keep_native, keep_device)


def test_native_nms_matches_numpy_fallback():
    boxes, scores = _boxes(seed=3)
    got = native.nms(boxes, scores, 0.4)
    ref = native._nms_np(boxes, scores, 0.4, len(boxes))
    np.testing.assert_array_equal(got, ref)


def test_native_overlaps_match_numpy():
    boxes, _ = _boxes(seed=1)
    query, _ = _boxes(20, seed=2)
    got = native.bbox_overlaps(boxes, query)
    ref = native._bbox_overlaps_np(boxes[:, :4], query[:, :4])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------- host image-prep kernels ----------------

def _np_s2d(im, u8_pad=None):
    """The original strided-numpy s2d_pack formulation, as the oracle."""
    b, h, w, c = im.shape
    if im.dtype == np.uint8 and c == 3:
        xp = np.empty((b, h + 6, w + 6, c), im.dtype)
        xp[:] = blob.U8_PAD_MEANS if u8_pad is None else u8_pad
    else:
        xp = np.zeros((b, h + 6, w + 6, c), im.dtype)
    xp[:, 3:3 + h, 3:3 + w] = im
    xd = np.empty((b, (h + 6) // 2, (w + 6) // 2, 4 * c), im.dtype)
    for i2 in range(2):
        for j2 in range(2):
            k = (i2 * 2 + j2) * c
            xd[..., k:k + c] = xp[:, i2::2, j2::2, :]
    return xd


def test_native_s2d_pack_exact():
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.uint8):
        im = (rng.random((2, 64, 96, 3)) * 255).astype(dtype)
        np.testing.assert_array_equal(blob.s2d_pack(im), _np_s2d(im))


def test_native_pad_s2d_fused_exact():
    """native.pad_s2d == s2d(pad_to_canvas(im)) for both dtypes."""
    rng = np.random.default_rng(1)
    im = (rng.random((60, 80, 3)) * 255 - 120).astype(np.float32)
    canvas = (64, 96)
    ref = _np_s2d(blob.pad_to_canvas(im, canvas)[None])[0]
    got = native.pad_s2d(im, canvas)
    np.testing.assert_array_equal(got, ref)

    imu = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    cu = np.empty((64, 96, 3), np.uint8)
    cu[:] = blob.U8_PAD_MEANS
    cu[:60, :80] = imu
    refu = _np_s2d(cu[None])[0]
    gotu = native.pad_s2d(imu, canvas, blob.U8_PAD_MEANS)
    np.testing.assert_array_equal(gotu, refu)


def test_native_meansub_exact():
    rng = np.random.default_rng(2)
    means = np.array([[[102.9801, 115.9465, 122.7717]]])
    imu = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(
        native.meansub(imu, means),
        (imu.astype(np.float32) - means.astype(np.float32)))
    imf = imu.astype(np.float32)
    np.testing.assert_array_equal(
        native.meansub(imf, means),
        imf - means.astype(np.float32))


def test_query_blob_packed_matches_two_step():
    """Fused loader path == s2d_pack(query_blob(...)) bit-for-bit."""
    rng = np.random.default_rng(3)
    means = np.array([[[102.9801, 115.9465, 122.7717]]])
    im = (rng.random((120, 180, 3)) * 255).astype(np.float32)
    buckets = ((128, 192), (192, 128))
    packed, info = blob.query_blob_packed(im, means, target_size=100,
                                          buckets=buckets)
    data, info2 = blob.query_blob(im, means, target_size=100,
                                  buckets=buckets)
    np.testing.assert_array_equal(info, info2)
    np.testing.assert_array_equal(packed, blob.s2d_pack(data))

    # uint8 shipping variant
    p_u8, info3 = blob.query_blob_packed(im, means, target_size=100,
                                         buckets=buckets, ship_uint8=True)
    d_u8, info4 = blob.query_blob_u8(im, 100, buckets=buckets,
                                     pixel_means=means)
    np.testing.assert_array_equal(info3, info4)
    np.testing.assert_array_equal(
        p_u8, blob.s2d_pack(d_u8, u8_pad=blob.u8_pad_of(means)))


def test_native_pad_s2d_randomized_shapes():
    """Property test over random (src, canvas) shape pairs, both dtypes:
    native fused pack == numpy pad-then-pack, including src clipping
    (src larger than canvas) and near-boundary sizes."""
    rng = np.random.default_rng(4)
    for _ in range(25):
        ch, cw = 2 * rng.integers(4, 40), 2 * rng.integers(4, 40)
        h = int(rng.integers(1, ch + 8))
        w = int(rng.integers(1, cw + 8))
        for dtype in (np.float32, np.uint8):
            im = (rng.random((h, w, 3)) * 255).astype(dtype)
            clip = im[:ch, :cw]
            if dtype == np.uint8:
                canvas = np.empty((ch, cw, 3), np.uint8)
                canvas[:] = blob.U8_PAD_MEANS
                pad3 = blob.U8_PAD_MEANS
            else:
                canvas = np.zeros((ch, cw, 3), np.float32)
                pad3 = None
            canvas[:clip.shape[0], :clip.shape[1]] = clip
            ref = _np_s2d(canvas[None])[0]
            got = native.pad_s2d(im, (ch, cw), pad3)
            np.testing.assert_array_equal(got, ref,
                                          err_msg=f'{dtype} {h}x{w} '
                                                  f'-> {ch}x{cw}')


def test_prep_fallback_matches_native_bitexact(monkeypatch):
    """The numpy fallback must be BIT-identical to the native meansub:
    cfg.PIXEL_MEANS is float64, and a bare `im - means` broadcast would
    promote the whole image to f64 so cv2.resize runs in f64 — making
    DANA_NO_NATIVE A/B runs drift vs the native arm (~2e-5 post-resize).
    Both prep paths must subtract f32 means."""
    rng = np.random.default_rng(7)
    means = np.array([[[102.9801, 115.9465, 122.7717]]])   # f64, like cfg
    im = (rng.random((90, 130, 3)) * 255).astype(np.float32)
    a_im, a_sc = blob.prep_im_for_blob(im.copy(), means, 60)
    a_sup = blob.support_blob(im.copy(), [10, 12, 100, 70], means, 64)
    monkeypatch.setattr(blob._native, 'meansub', lambda *a, **k: None)
    b_im, b_sc = blob.prep_im_for_blob(im.copy(), means, 60)
    b_sup = blob.support_blob(im.copy(), [10, 12, 100, 70], means, 64)
    assert a_sc == b_sc
    np.testing.assert_array_equal(a_im, b_im)
    np.testing.assert_array_equal(a_sup, b_sup)


def test_query_blob_packed_odd_bucket_falls_back_to_3ch(monkeypatch):
    """A user-set ODD canvas can't be s2d-packed (even dims required):
    every arm of the packed pipeline must return the plain 3-channel
    canvas (the model stem branches on channel count) instead of
    tripping s2d_pack's evenness assert."""
    rng = np.random.default_rng(11)
    means = np.array([[[102.9801, 115.9465, 122.7717]]])
    im = (rng.random((80, 120, 3)) * 255).astype(np.float32)
    buckets = ((99, 149),)
    for ship in (False, True):                       # native arms
        data, info = blob.query_blob_packed(
            im, means, target_size=60, buckets=buckets, ship_uint8=ship)
        assert data.shape == (99, 149, 3), (ship, data.shape)
    monkeypatch.setattr(blob._native, 'meansub', lambda *a, **k: None)
    monkeypatch.setattr(blob._native, 'pad_s2d', lambda *a, **k: None)
    for ship in (False, True):                       # numpy-fallback arms
        data, info = blob.query_blob_packed(
            im, means, target_size=60, buckets=buckets, ship_uint8=ship)
        assert data.shape == (99, 149, 3), (ship, data.shape)


def test_fifo_cache_bounds():
    c = blob.FIFOCache(2)
    c.put('a', 1), c.put('b', 2), c.put('c', 3)
    assert c.get('a') is None                        # FIFO-evicted
    assert c.get('b') == 2 and c.get('c') == 3
    off = blob.FIFOCache(0)                          # cap 0 = disabled
    assert off.put('a', 1) == 1 and off.get('a') is None
