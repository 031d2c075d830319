"""TPU.SHIP_UINT8: raw uint8 queries with device-side mean subtraction
(4x less host->device wire traffic).  The only deviation vs the f32
path is cv2's per-pixel rounding when resizing uint8 (<=1 LSB)."""

import os.path as osp
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dana_tpu.data import blob

MEANS = np.array([[[102.9801, 115.9465, 122.7717]]], np.float32)


def test_u8_canvas_matches_f32_within_rounding():
    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, (100, 140, 3)).astype(np.uint8)
    f32, info_f = blob.query_blob(im.astype(np.float32), MEANS,
                                  target_size=96, max_size=None)
    u8, info_u = blob.query_blob_u8(im, target_size=96, max_size=None)
    np.testing.assert_array_equal(info_f, info_u)
    assert u8.dtype == np.uint8
    # mean-sub on the u8 canvas lands within 1 LSB of the f32 pipeline
    # (mean subtraction commutes with the affine resample; the uint8
    # resize rounds each output pixel)
    h, w = int(info_f[0]), int(info_f[1])
    diff = np.abs((u8[:h, :w].astype(np.float32) - MEANS.reshape(1, 1, 3))
                  - f32[:h, :w])
    assert diff.max() <= 1.0, diff.max()
    # padding stays zero-vs-means consistent in shape
    assert u8.shape == f32.shape


def test_forward_accepts_uint8_and_s2d_uint8():
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    cfg = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=100,
                          train_post_nms=16, test_pre_nms=100,
                          test_post_nms=8, nms_cap=100,
                          use_pallas_attention=False)
    params = to_jnp(dana.init_params(cfg, seed=0))
    rng = np.random.default_rng(1)
    im_u8 = rng.integers(0, 256, (1, 64, 96, 3)).astype(np.uint8)
    im_f32 = im_u8.astype(np.float32) - np.asarray(cfg.pixel_means,
                                                   np.float32)
    sup = rng.normal(size=(1, 1, 224, 224, 3)).astype(np.float32)
    info = jnp.array([[64.0, 96.0, 1.0]])

    a = dana.forward(params, cfg, jnp.asarray(im_f32), info,
                     jnp.asarray(sup), training=False)
    b = dana.forward(params, cfg, jnp.asarray(im_u8), info,
                     jnp.asarray(sup), training=False)
    np.testing.assert_allclose(np.asarray(a['cls_prob']),
                               np.asarray(b['cls_prob']), rtol=1e-4,
                               atol=1e-5)
    # uint8 + host s2d packing compose (the production SHIP_UINT8 +
    # STEM_S2D combination).  The conv pad-3 border carries the rounded
    # means (maps to +-0.5 after device mean-sub vs the f32 path's exact
    # zeros), so the comparison is approximate, not bit-exact.
    c = dana.forward(params, cfg, jnp.asarray(blob.s2d_pack(im_u8)),
                     info, jnp.asarray(sup), training=False)
    np.testing.assert_allclose(np.asarray(a['cls_prob']),
                               np.asarray(c['cls_prob']), rtol=0.05,
                               atol=0.02)


def test_inference_loader_ship_uint8(tmp_path, monkeypatch):
    from dana_tpu.utils.config import cfg
    from dana_tpu.data.synth import synth_fsod
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    monkeypatch.setattr(cfg.TPU, 'SHIP_UINT8', True, raising=False)
    from dana_tpu.data.inference_loader import InferenceLoader, SupportPool
    ds = synth_fsod('test', num_images=2)
    roidb = ds.gt_roidb()
    for e, i in zip(roidb, ds._image_index):
        e['image'] = ds.image_path_at(ds._image_index.index(i))
    pool = SupportPool(ds.classes, 1, support_roidb=roidb, seed=0)
    ld = InferenceLoader(roidb, pool)
    item = ld[0]
    assert item['im_data'].dtype == np.uint8
