"""Data-parallel mesh tests on the 8-virtual-device CPU platform:
sharded train step executes and matches the unsharded step's metrics;
sharded inference equals single-device inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dana_tpu.engine import optim, train
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason='needs multi-device CPU platform')

CFG = dana.DanaConfig(n_way=2, n_shot=2, train_pre_nms=200,
                      train_post_nms=32, test_pre_nms=200, test_post_nms=16,
                      nms_cap=200, rois_per_image=16, rpn_batchsize=32)


def _batch(b):
    return {
        'im_data': jnp.zeros((b, 128, 160, 3)),
        'im_info': jnp.tile(jnp.array([[128.0, 160.0, 1.0]]), (b, 1)),
        'gt_boxes': jnp.tile(
            jnp.array([[[10.0, 10.0, 100.0, 90.0, 1.0]] + [[0.0] * 5] * 2]),
            (b, 1, 1)),
        'support_ims': jnp.zeros((b, 4, 320, 320, 3)),
    }


def test_sharded_train_step_matches_single_device():
    n = min(4, len(jax.devices()))
    params = to_jnp(dana.init_params(CFG, seed=0))
    trainable = optim.trainable_mask(params)
    step = train.make_train_step(CFG, trainable)
    batch = _batch(n)
    rng = jax.random.PRNGKey(0)

    state1 = train.create_train_state(params, 1e-3)
    _, m_single = step(state1, batch, rng)

    mesh = train.make_mesh(jax.devices()[:n])
    state2 = train.replicate(train.create_train_state(params, 1e-3), mesh)
    sharded = train.shard_batch(batch, mesh)
    new_state, m_sharded = step(state2, sharded, rng)
    jax.block_until_ready(new_state.params)

    for k in m_single:
        np.testing.assert_allclose(float(m_single[k]),
                                   float(m_sharded[k]), rtol=1e-4,
                                   atol=1e-5)


def test_sharded_inference_matches_single_device():
    n = min(4, len(jax.devices()))
    params = to_jnp(dana.init_params(CFG, seed=0))
    batch = _batch(n)
    out1 = train.predict_step(params, CFG, batch['im_data'],
                              batch['im_info'],
                              batch['support_ims'][:, :2])
    mesh = train.make_mesh(jax.devices()[:n])
    sb = train.shard_batch({'im_data': batch['im_data'],
                            'im_info': batch['im_info'],
                            'support_ims': batch['support_ims'][:, :2]},
                           mesh)
    params_r = train.replicate(params, mesh)
    out2 = train.predict_step(params_r, CFG, sb['im_data'], sb['im_info'],
                              sb['support_ims'])
    np.testing.assert_allclose(np.asarray(out1['cls_prob']),
                               np.asarray(out2['cls_prob']), rtol=1e-4,
                               atol=1e-5)
