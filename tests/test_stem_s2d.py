"""Host-packed space-to-depth stem is exact vs the direct 7x7/2 conv
(VERDICT r2 item 5b lever; packing math in blob.s2d_pack, device side in
resnet.conv1_s2d/stem)."""

import os.path as osp
import sys

import jax
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dana_tpu.data import blob
from dana_tpu.models import layers as L
from dana_tpu.models import resnet


def test_conv1_s2d_exact():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
    params = {'conv1': L.init_conv(rng, 7, 7, 3, 64),
              'bn1': L.init_bn(64)}
    xd = blob.s2d_pack(x)
    assert xd.shape == (2, 35, 51, 12)
    a = np.asarray(jax.jit(lambda p, x: L.conv2d(
        x, p['conv1'], stride=2, padding=3))(params, x))
    b = np.asarray(jax.jit(resnet.conv1_s2d)(xd, params['conv1']))
    assert a.shape == b.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_full_stem_s2d_matches_direct():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 128, 160, 3)).astype(np.float32)
    params = {'conv1': L.init_conv(rng, 7, 7, 3, 64),
              'bn1': L.init_bn(64)}
    a = np.asarray(jax.jit(resnet.stem)(x, params))
    b = np.asarray(jax.jit(resnet.stem)(blob.s2d_pack(x), params))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_dana_forward_s2d_matches_direct():
    """Full episodic forward with host-packed query+support inputs equals
    the direct 3-channel path (the production wiring in train.py /
    inference.py / bench.py)."""
    import jax.numpy as jnp
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    cfg = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=200,
                          train_post_nms=32, test_pre_nms=200,
                          test_post_nms=16, nms_cap=200,
                          use_pallas_attention=False)
    params = to_jnp(dana.init_params(cfg, seed=0))
    rng = np.random.default_rng(3)
    im = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    sup = rng.normal(size=(1, 1, 224, 224, 3)).astype(np.float32)
    info = jnp.array([[64.0, 96.0, 1.0]])

    a = dana.forward(params, cfg, jnp.asarray(im), info,
                     jnp.asarray(sup), training=False)
    b = dana.forward(params, cfg, jnp.asarray(blob.s2d_pack(im)), info,
                     jnp.asarray(blob.s2d_pack_any(sup)), training=False)
    np.testing.assert_allclose(np.asarray(a['cls_prob']),
                               np.asarray(b['cls_prob']), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a['rois']),
                               np.asarray(b['rois']), rtol=1e-4,
                               atol=1e-4)


def test_s2d_pack_single_image():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(32, 48, 3)).astype(np.float32)
    xd = blob.s2d_pack(x)
    assert xd.shape == (19, 27, 12)
    np.testing.assert_array_equal(xd, blob.s2d_pack(x[None])[0])
