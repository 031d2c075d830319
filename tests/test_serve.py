"""Serving export (dana_tpu/serve.py): serialize the predict step +
support encoder to StableHLO artifacts, reload them WITHOUT the model
code path being retraced, and check outputs match the live functions.
"""

import os.path as osp
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dana_tpu import serve
from dana_tpu.engine.postprocess import postprocess_batch
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp


@pytest.fixture(scope='module')
def small():
    cfg = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=100,
                          train_post_nms=16, test_pre_nms=100,
                          test_post_nms=8, nms_cap=100,
                          use_pallas_attention=False)
    params = to_jnp(dana.init_params(cfg, seed=0))
    return cfg, params


def test_export_roundtrip(tmp_path, small):
    cfg, params = small
    out = str(tmp_path / 'artifact')
    meta = serve.export_predictor(params, cfg, out,
                                  buckets=((64, 96), (96, 64)),
                                  batch_size=2, sup_size=224)
    assert len(meta['buckets']) == 2 and not meta['quantized']

    pred = serve.load(out)
    assert pred.buckets() == [(64, 96), (96, 64)]

    rng = np.random.default_rng(0)
    sup = jnp.asarray(rng.normal(size=(1, 2, 224, 224, 3)), jnp.float32)
    feats = pred.encode(params, sup)
    ref_feats = dana.extract_support_feats(params, cfg, sup)
    for a, b in zip(feats, ref_feats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    im = jnp.asarray(rng.normal(size=(2, 64, 96, 3)) * 40, jnp.float32)
    info = jnp.tile(jnp.array([[64.0, 96.0, 1.0]]), (2, 1))
    bf = jnp.concatenate([feats[0]] * 2)
    bp = jnp.concatenate([feats[1]] * 2)
    dets, valid = pred(params, im, info, bf, bp)

    out_ref = dana.forward(params, cfg, im, info, training=False,
                           support_feats=(bf, bp))
    ref_dets, ref_valid = postprocess_batch(
        out_ref['rois'], out_ref['cls_prob'], out_ref['bbox_pred'], info)
    np.testing.assert_allclose(np.asarray(dets), np.asarray(ref_dets),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid),
                                  np.asarray(ref_valid))


def test_export_quantized_marker(tmp_path, small):
    from dana_tpu import quant
    cfg, params = small
    qp = to_jnp(quant.quantize_params(params, scope='tail'))
    out = str(tmp_path / 'artifact_q')
    meta = serve.export_predictor(qp, cfg, out, buckets=((64, 96),),
                                  batch_size=1, sup_size=224)
    assert meta['quantized']
    pred = serve.load(out)
    rng = np.random.default_rng(1)
    sup = jnp.asarray(rng.normal(size=(1, 2, 224, 224, 3)), jnp.float32)
    feats = pred.encode(qp, sup)
    im = jnp.asarray(rng.normal(size=(1, 64, 96, 3)) * 40, jnp.float32)
    info = jnp.array([[64.0, 96.0, 1.0]])
    dets, valid = pred(qp, im, info, feats[0], feats[1])
    assert np.isfinite(np.asarray(dets)).all()


def test_export_s2d_variant(tmp_path, small):
    """s2d export: artifact signature takes host-packed 12-channel
    surfaces (blob.s2d_pack) and matches the direct path's outputs."""
    from dana_tpu.data import blob
    cfg, params = small
    out = str(tmp_path / 'artifact_s2d')
    meta = serve.export_predictor(params, cfg, out, buckets=((64, 96),),
                                  batch_size=1, sup_size=224, s2d=True)
    assert meta['s2d']
    pred = serve.load(out)
    rng = np.random.default_rng(2)
    sup = rng.normal(size=(1, 2, 224, 224, 3)).astype(np.float32)
    feats = pred.encode(params, jnp.asarray(blob.s2d_pack_any(sup)))
    ref_feats = dana.extract_support_feats(params, cfg,
                                           jnp.asarray(sup))
    for a, b in zip(feats, ref_feats):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)
    im = rng.normal(size=(1, 64, 96, 3)).astype(np.float32) * 40
    info = jnp.array([[64.0, 96.0, 1.0]])
    dets, valid = pred(params, jnp.asarray(blob.s2d_pack(im)), info,
                       feats[0], feats[1])
    ref = dana.forward(params, cfg, jnp.asarray(im), info,
                       training=False, support_feats=ref_feats)
    from dana_tpu.engine.postprocess import postprocess_batch
    rd, rv = postprocess_batch(ref['rois'], ref['cls_prob'],
                               ref['bbox_pred'], info)
    # s2d stem is mathematically identical; tolerance for bf16 churn
    np.testing.assert_allclose(np.asarray(dets), np.asarray(rd),
                               rtol=1e-3, atol=1e-3)
