"""Train-mode BatchNorm: torch parity + FGN head wiring.

VERDICT r1 item 7: the reference FGN's head bn1/bn2 are ordinary
train-mode nn.BatchNorm2d (/root/reference/lib/model/framework/
fgn.py:145-165); our batchnorm_train must match torch's normalization
and running-stat updates, and the train step must merge the updated
stats into the params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dana_tpu.models import layers as L


def test_batchnorm_train_torch_parity():
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(0)
    n, h, w, c = 4, 5, 6, 8
    x = rng.normal(0, 2.0, (n, h, w, c)).astype(np.float32)

    bn = torch.nn.BatchNorm2d(c, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(
            rng.normal(1, 0.2, c).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(
            rng.normal(0, 0.2, c).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(
            rng.normal(0, 0.5, c).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 2.0, c).astype(np.float32)))

    params = {'weight': bn.weight.detach().numpy().copy(),
              'bias': bn.bias.detach().numpy().copy(),
              'running_mean': bn.running_mean.numpy().copy(),
              'running_var': bn.running_var.numpy().copy()}

    bn.train()
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)   # NHWC -> NCHW
    yt = bn(xt).permute(0, 2, 3, 1).detach().numpy()

    y, new_stats = L.batchnorm_train(jnp.asarray(x), params, momentum=0.1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_stats['running_mean']),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_stats['running_var']),
                               bn.running_var.numpy(), atol=1e-5)


def test_fgn_train_step_updates_bn_stats():
    from dana_tpu.engine import optim, train
    from dana_tpu.models import frameworks as fw
    from dana_tpu.models.layers import to_jnp

    common = dict(n_way=2, n_shot=2, train_pre_nms=200, train_post_nms=32,
                  test_pre_nms=200, test_post_nms=16, nms_cap=200,
                  rois_per_image=16, rpn_batchsize=32, bn_train=True)
    config, params = fw.get_model('fgn', common, seed=0)
    params = to_jnp(params)
    batch = {
        'im_data': jnp.ones((1, 128, 160, 3)) * 0.5,
        'im_info': jnp.array([[128.0, 160.0, 1.0]]),
        'gt_boxes': jnp.zeros((1, 3, 5)).at[:, 0].set(
            jnp.array([10.0, 10.0, 100.0, 90.0, 1.0])),
        'support_ims': jnp.ones((1, 4, 320, 320, 3)) * 0.3,
    }
    state = train.create_train_state(params, lr=1e-3)
    step = train.make_train_step(config, optim.trainable_mask(params),
                                 model='fgn')
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    assert '_param_updates' not in metrics
    for name in ('bn1', 'bn2'):
        before = np.asarray(params[name]['running_mean'])
        after = np.asarray(new_state.params[name]['running_mean'])
        assert not np.allclose(before, after), f'{name} stats not updated'
        # momentum=0.1 twice (pos+neg head calls): stats move but stay sane
        assert np.isfinite(after).all()

    # bn_train=False leaves the stats untouched
    import dataclasses
    config2 = dataclasses.replace(config, bn_train=False)
    step2 = train.make_train_step(config2, optim.trainable_mask(params),
                                  model='fgn')
    new_state2, _ = step2(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(new_state2.params['bn1']['running_mean']),
        np.asarray(params['bn1']['running_mean']))
