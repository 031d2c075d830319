"""End-to-end forward smokes for every model family (tiny shapes, CPU).

Covers the five reference frameworks (SURVEY §2.2): DAnA (resnet50 +
vgg16 backbones), FSOD, Meta R-CNN, FGN, FasterRCNN — eval + train mode,
finite losses, correct output shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dana_tpu.models import dana
from dana_tpu.models import frameworks as fw
from dana_tpu.models.layers import to_jnp

COMMON = dict(n_way=2, n_shot=2, train_pre_nms=200, train_post_nms=32,
              test_pre_nms=200, test_post_nms=16, nms_cap=200,
              rois_per_image=16, rpn_batchsize=32)


def _data(n_sup):
    im = jnp.zeros((1, 128, 160, 3))
    info = jnp.array([[128.0, 160.0, 1.0]])
    sup = jnp.zeros((1, n_sup, 320, 320, 3))
    gt = jnp.zeros((1, 3, 5)).at[:, 0].set(
        jnp.array([10.0, 10.0, 100.0, 90.0, 1.0]))
    return im, info, sup, gt


@pytest.mark.parametrize('arch', ['resnet50', 'vgg16'])
def test_dana_forward(arch):
    config = dana.DanaConfig(arch=arch, **COMMON)
    params = to_jnp(dana.init_params(config, seed=0))
    im, info, sup, gt = _data(config.n_shot)
    out = dana.forward(params, config, im, info, sup, training=False)
    assert out['rois'].shape == (1, 16, 5)
    assert out['cls_prob'].shape == (1, 16, 2)
    assert np.isfinite(np.asarray(out['cls_prob'])).all()

    _, _, sup_t, _ = _data(config.n_way * config.n_shot)
    out = dana.forward(params, config, im, info, sup_t, training=True,
                       gt_boxes=gt, rng=jax.random.PRNGKey(0))
    for k in ('rpn_loss_cls', 'rpn_loss_box', 'rcnn_loss_cls',
              'rcnn_loss_bbox'):
        assert np.isfinite(float(out[k])), k


@pytest.mark.parametrize('name', ['fsod', 'meta', 'fgn'])
def test_sibling_frameworks(name):
    config, params = fw.get_model(name, COMMON, seed=0)
    params = to_jnp(params)
    f = fw.forward_fn(name)
    im, info, sup, gt = _data(config.n_shot)
    out = f(params, config, im, info, sup, training=False)
    assert out['cls_prob'].shape == (1, 16, 2)
    _, _, sup_t, _ = _data(config.n_way * config.n_shot)
    out = f(params, config, im, info, sup_t, training=True, gt_boxes=gt,
            rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(out['rcnn_loss_cls']))
    assert np.isfinite(float(out['rcnn_loss_bbox']))


def test_frcnn():
    config, params = fw.get_model('frcnn', COMMON, seed=0)
    params = to_jnp(params)
    im, info, _, gt = _data(1)
    out = fw.frcnn_forward(params, config, im, info, training=False)
    assert out['cls_prob'].shape == (1, 16, 2)
    out = fw.frcnn_forward(params, config, im, info, training=True,
                           gt_boxes=gt, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(out['rcnn_loss_cls']))


def test_random_init_activations_bounded():
    """SkipInit keeps random-init forwards sane (no 2^16 blowup)."""
    from dana_tpu.models import resnet
    params = to_jnp(resnet.init_params('resnet50', seed=0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 160, 3)) * 50
    feat = resnet.base_forward(x, params)
    assert float(jnp.abs(feat).max()) < 1e3


def test_remat_backbone_is_numerically_identical():
    """cfg.TPU.REMAT_BACKBONE wraps the trunk in jax.checkpoint — pure
    recompute, must not change the step (loss and updated params
    bit-comparable at f32 tolerance)."""
    import dataclasses

    import jax

    from dana_tpu.engine import optim, train
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    base = dana.DanaConfig(n_way=2, n_shot=1, arch='resnet50',
                           anchor_scales=(8, 16, 32),
                           train_pre_nms=300, train_post_nms=32,
                           nms_cap=300, rois_per_image=32,
                           use_pallas_attention=False)
    params = to_jnp(dana.init_params(base, seed=0))
    batch = {
        'im_data': jnp.zeros((1, 304, 304, 3)) + 0.3,
        'im_info': jnp.array([[304.0, 304.0, 1.0]]),
        'gt_boxes': jnp.array([[[40.0, 50.0, 200.0, 180.0, 1.0]]
                               + [[0.0] * 5] * 19]),
        'support_ims': jnp.zeros((1, 2, 224, 224, 3)) + 0.2,
    }
    k = jax.random.PRNGKey(3)
    outs = {}
    for remat in (False, True):
        cfgv = dataclasses.replace(base, remat_backbone=remat)
        state = train.create_train_state(params, 1e-3)
        step = train.make_train_step(cfgv, optim.trainable_mask(params))
        new_state, metrics = jax.jit(step)(state, batch, k)
        outs[remat] = (metrics['loss'], new_state.params)
    np.testing.assert_allclose(float(outs[False][0]), float(outs[True][0]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        outs[False][1], outs[True][1])
