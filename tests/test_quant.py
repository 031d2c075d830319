"""int8 post-training quantization of the conv backbone
(dana_tpu/quant.py + layers._dynamic_int8_conv).

The reference has no counterpart (f32 CUDA serving); correctness here is
(a) the BN fold is exact, (b) the int8 path's error is bounded like an
8-bit quantizer, (c) the full quantized backbone/forward stays close to
float, (d) the s2d stem composition quantizes consistently.
"""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dana_tpu import quant
from dana_tpu.models import layers as L
from dana_tpu.models import resnet
from dana_tpu.models.layers import to_jnp


def _rand_conv(rng, kh, kw, cin, cout, bias=False):
    p = {'weight': rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)
         * 0.1}
    if bias:
        p['bias'] = rng.normal(size=cout).astype(np.float32)
    return p


def _rand_bn(rng, n):
    return {'weight': rng.uniform(0.5, 1.5, n).astype(np.float32),
            'bias': rng.normal(size=n).astype(np.float32),
            'running_mean': rng.normal(size=n).astype(np.float32),
            'running_var': rng.uniform(0.3, 2.0, n).astype(np.float32)}


def test_fold_bn_exact():
    rng = np.random.default_rng(0)
    conv, bn = _rand_conv(rng, 3, 3, 8, 16, bias=True), _rand_bn(rng, 16)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 8)), jnp.float32)
    ref = L.frozen_batchnorm(L.conv2d(x, to_jnp(conv), padding=1),
                             to_jnp(bn))
    folded = to_jnp(quant._fold_bn(conv, bn))
    got = L.conv2d(x, folded, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_identity_bn_is_noop():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    y = L.frozen_batchnorm(x, to_jnp(quant._identity_bn(8)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_int8_conv_error_bound():
    rng = np.random.default_rng(2)
    conv = _rand_conv(rng, 3, 3, 32, 64, bias=True)
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 32)), jnp.float32)
    ref = np.asarray(L.conv2d(x, to_jnp(conv), padding=1))
    got = np.asarray(L.conv2d(x, to_jnp(quant.quantize_conv(conv)),
                              padding=1))
    # 8-bit weights x 8-bit activations: per-output error a small
    # fraction of the output scale
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.03, rel
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_quantized_backbone_close_to_float():
    rng = np.random.default_rng(3)
    params = resnet.init_params('resnet50', seed=0,
                                zero_init_residual=False)
    # give frozen BNs non-trivial stats so the fold is exercised
    def spice(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if 'running_var' in v:
                    n = len(v['running_var'])
                    v.update(_rand_bn(rng, n))
                else:
                    spice(v)
    spice(params)
    # scale residual convs down so random-init activations stay sane
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)) * 50, jnp.float32)
    ref = np.asarray(resnet.base_forward(x, to_jnp(params)))
    qp = to_jnp(quant.quantize_backbone(params))
    got = np.asarray(resnet.base_forward(x, qp))
    assert np.isfinite(got).all()
    denom = np.abs(ref).mean() + 1e-9
    assert np.abs(got - ref).mean() / denom < 0.1
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.99
    # tail too
    pooled = jnp.asarray(rng.normal(size=(4, 7, 7, 1024)), jnp.float32)
    rt = np.asarray(resnet.top_forward(pooled, to_jnp(params)))
    qt = np.asarray(resnet.top_forward(pooled, qp))
    assert np.corrcoef(qt.ravel(), rt.ravel())[0, 1] > 0.99


def test_quantized_stem_s2d_matches_direct():
    """int8 stem: host-s2d-packed path vs direct 3-channel path."""
    from dana_tpu.data import blob
    rng = np.random.default_rng(4)
    params = {'conv1': _rand_conv(rng, 7, 7, 3, 64),
              'bn1': _rand_bn(rng, 64)}
    qp = to_jnp(quant.quantize_backbone(
        {**params, 'layer1': {}, 'layer2': {}, 'layer3': {},
         'layer4': {}}))
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32) * 30
    direct = np.asarray(resnet.stem(jnp.asarray(x), qp))
    packed = np.asarray(resnet.stem(jnp.asarray(blob.s2d_pack(x)), qp))
    # both run the same int8 kernel modulo the s2d rewrite; the dynamic
    # activation scale differs only via the zero-padded border
    np.testing.assert_allclose(packed, direct, rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_quantize_params_full_forward():
    """Full DAnA forward on a quantized tree: runs, finite, and ranks
    proposals similarly to float."""
    from dana_tpu.models import dana

    cfg = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=100,
                          train_post_nms=16, test_pre_nms=100,
                          test_post_nms=8, nms_cap=100,
                          use_pallas_attention=False)
    params = dana.init_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    im = jnp.asarray(rng.normal(size=(1, 64, 96, 3)) * 40, jnp.float32)
    sup = jnp.asarray(rng.normal(size=(1, 1, 224, 224, 3)), jnp.float32)
    info = jnp.array([[64.0, 96.0, 1.0]])
    ref = dana.forward(to_jnp(params), cfg, im, info, sup,
                       training=False)
    # default scope='tail' leaves the early backbone untouched
    tail_only = quant.quantize_params(params)
    assert 'w_int8' not in tail_only['backbone']['layer1']['0']['conv1']
    assert 'w_int8' in tail_only['backbone']['layer4']['0']['conv1']
    qp = to_jnp(quant.quantize_params(params, scope='all'))
    got = dana.forward(qp, cfg, im, info, sup, training=False)
    assert np.isfinite(np.asarray(got['cls_prob'])).all()
    assert np.isfinite(np.asarray(got['bbox_pred'])).all()
    r = np.asarray(ref['cls_prob']).ravel()
    g = np.asarray(got['cls_prob']).ravel()
    assert np.corrcoef(r, g)[0, 1] > 0.95


def test_roi_align_int8_close_to_float():
    """ops/roi_align.py int8=True: the int8 MXU serving path stays close
    to the f32 separable path (per-row weight scales keep the hat
    functions exact to 1/127)."""
    from dana_tpu.ops.roi_align import roi_align
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(2, 19, 25, 64)).astype(np.float32)
    rois = np.stack([
        np.array([[16, 16, 160, 120], [0, 0, 380, 290],
                  [40, 8, 90, 200]], np.float32)] * 2)
    ref = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois)))
    got = np.asarray(roi_align(jnp.asarray(feat, jnp.bfloat16),
                               jnp.asarray(rois), int8=True))
    denom = np.abs(ref).mean() + 1e-9
    assert np.abs(got.astype(np.float32) - ref).mean() / denom < 0.02
    assert np.corrcoef(got.astype(np.float32).ravel(),
                       ref.ravel())[0, 1] > 0.999
