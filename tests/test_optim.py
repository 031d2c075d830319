"""Optimizer parity vs torch.optim.SGD with the reference's param groups
(bias lr doubling + no bias decay, train.py:78-89)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from dana_tpu.engine import optim  # noqa: E402


def test_sgd_matches_torch_param_groups():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32)
    grads_seq = [(rng.normal(size=(4, 3)).astype(np.float32),
                  rng.normal(size=(3,)).astype(np.float32))
                 for _ in range(4)]
    lr, momentum, wd = 0.01, 0.9, 0.0005

    tw = torch.nn.Parameter(torch.tensor(w))
    tb = torch.nn.Parameter(torch.tensor(b))
    opt = torch.optim.SGD(
        [{'params': [tw], 'lr': lr, 'weight_decay': wd},
         {'params': [tb], 'lr': lr * 2, 'weight_decay': 0}],
        momentum=momentum)
    for gw, gb in grads_seq:
        opt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        opt.step()

    params = {'layer': {'weight': jnp.asarray(w), 'bias': jnp.asarray(b)}}
    state = optim.sgd_init(params)._replace(lr=jnp.float32(lr))
    for gw, gb in grads_seq:
        grads = {'layer': {'weight': jnp.asarray(gw),
                           'bias': jnp.asarray(gb)}}
        params, state = optim.sgd_update(
            params, grads, state, momentum=momentum, weight_decay=wd,
            double_bias=True)

    np.testing.assert_allclose(np.asarray(params['layer']['weight']),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params['layer']['bias']),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_frozen_leaves_untouched():
    params = {'backbone': {'conv1': {'weight': jnp.ones((2, 2))},
                           'layer4': {'0': {'conv1':
                                            {'weight': jnp.ones((2, 2))}}}},
              'head': {'weight': jnp.ones((2, 2))}}
    trainable = optim.trainable_mask(params)
    assert trainable['backbone']['conv1']['weight'] is False
    assert trainable['backbone']['layer4']['0']['conv1']['weight'] is True
    assert trainable['head']['weight'] is True
    grads = {'backbone': {'conv1': {'weight': jnp.ones((2, 2))},
                          'layer4': {'0': {'conv1':
                                           {'weight': jnp.ones((2, 2))}}}},
             'head': {'weight': jnp.ones((2, 2))}}
    state = optim.sgd_init(params)._replace(lr=jnp.float32(0.1))
    new_params, _ = optim.sgd_update(params, grads, state,
                                     trainable=trainable)
    np.testing.assert_array_equal(
        np.asarray(new_params['backbone']['conv1']['weight']), 1.0)
    assert not np.allclose(
        np.asarray(new_params['head']['weight']), 1.0)
