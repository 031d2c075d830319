"""Checkpoint round-trip + torch .pth import behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from dana_tpu.utils import checkpoint as ck


def test_roundtrip(tmp_path):
    params = {'layer': {'weight': jnp.arange(6.0).reshape(2, 3),
                        'bias': jnp.zeros((3,))}}
    path = str(tmp_path / 'ck' / 'model_3_10.dkpt')
    ck.save_checkpoint(path, params, epoch=3, step=10, lr=0.01,
                       pooling_mode='align', extra={'note': 'x'})
    payload = ck.load_checkpoint(path)
    assert payload['epoch'] == 3 and payload['step'] == 10
    assert payload['lr'] == 0.01
    assert payload['pooling_mode'] == 'align'
    np.testing.assert_array_equal(payload['model']['layer']['weight'],
                                  np.arange(6.0).reshape(2, 3))


def test_orbax_roundtrip(tmp_path):
    """Orbax backend: same payload surface as the pickle path, including
    the optimizer NamedTuple -> dict round-trip restore_optimizer
    accepts."""
    pytest.importorskip('orbax.checkpoint')
    from dana_tpu.engine import optim
    params = {'layer': {'weight': jnp.arange(6.0).reshape(2, 3),
                        'bias': jnp.zeros((3,))}}
    opt = optim.sgd_init(params)._replace(lr=jnp.asarray(0.02))
    path = str(tmp_path / 'ck' / 'model_5_7.dkpt')
    out = ck.save_checkpoint(path, params, opt_state=opt, epoch=5, step=7,
                             lr=0.02, pooling_mode='pool',
                             extra={'note': 'orbax'}, backend='orbax')
    assert out.endswith('.odir')
    payload = ck.load_checkpoint(out)
    assert payload['epoch'] == 5 and payload['step'] == 7
    assert payload['pooling_mode'] == 'pool'
    assert payload['extra'] == {'note': 'orbax'}
    np.testing.assert_array_equal(payload['model']['layer']['weight'],
                                  np.arange(6.0).reshape(2, 3))
    vel = payload['optimizer']['velocity']
    np.testing.assert_array_equal(vel['layer']['weight'],
                                  np.zeros((2, 3)))
    # restore_optimizer consumes the dict payload
    from dana_tpu.engine import train as train_engine
    state = train_engine.create_train_state(params, 0.02)
    restored = train_engine.restore_optimizer(state, payload['optimizer'])
    np.testing.assert_array_equal(
        np.asarray(restored.opt.velocity['layer']['bias']), np.zeros(3))


def test_orbax_loads_through_standard_resume_path(tmp_path):
    """load_checkpoint(checkpoint_path(...)) must find an orbax-written
    checkpoint: save appends '.odir', resume passes the bare path."""
    pytest.importorskip('orbax.checkpoint')
    params = {'w': jnp.ones((2,))}
    path = str(tmp_path / 'ck' / 'model_2_5.dkpt')
    ck.save_checkpoint(path, params, epoch=2, step=5, backend='orbax')
    payload = ck.load_checkpoint(path)        # bare .dkpt path
    assert payload['epoch'] == 2
    np.testing.assert_array_equal(payload['model']['w'], np.ones(2))


def test_pth_import(tmp_path):
    torch = pytest.importorskip('torch')
    # reference-style checkpoint: {'model': sd, 'epoch', 'pooling_mode'}
    sd = {
        'RCNN_base.0.weight': torch.randn(4, 3, 7, 7),
        'rpn_adapt_q_layer.weight': torch.randn(8, 16),
        'rpn_adapt_q_layer.bias': torch.randn(8),
    }
    p = str(tmp_path / 'ref.pth')
    torch.save({'model': sd, 'epoch': 11, 'pooling_mode': 'align'}, p)
    payload = ck.load_checkpoint(p)
    assert payload['epoch'] == 11
    tree = payload['model']
    assert tree['backbone']['conv1']['weight'].shape == (7, 7, 3, 4)
    assert tree['rpn_adapt_q_layer']['weight'].shape == (16, 8)
    np.testing.assert_allclose(
        tree['rpn_adapt_q_layer']['weight'],
        sd['rpn_adapt_q_layer.weight'].numpy().T, rtol=1e-6)


def test_checkpoint_path_layout():
    p = ck.checkpoint_path('models', 4, 299)
    assert p.endswith('models/train/checkpoints/model_4_299.dkpt')


def test_resume_bitwise_continuation(tmp_path):
    """save -> resume (restore_optimizer) -> step must bitwise-match an
    uninterrupted run (reference --r restores optimizer state,
    train.py:96-99)."""
    import jax
    from dana_tpu.engine import optim
    from dana_tpu.engine import train as train_engine

    params = {'lin': {'weight': jnp.arange(6.0).reshape(2, 3) / 7.0,
                      'bias': jnp.ones((3,)) * 0.3}}

    def fake_grads(p, i):
        return jax.tree.map(lambda x: 0.1 * x + 0.01 * i, p)

    def step(state, i):
        new_p, new_opt = optim.sgd_update(
            state.params, fake_grads(state.params, i), state.opt,
            momentum=0.9, weight_decay=5e-4, double_bias=True)
        return train_engine.TrainState(new_p, new_opt, state.step + 1)

    # uninterrupted: 5 steps
    ref = train_engine.create_train_state(params, lr=0.05)
    for i in range(5):
        ref = step(ref, i)

    # interrupted at step 3: save, reload, continue
    st = train_engine.create_train_state(params, lr=0.05)
    for i in range(3):
        st = step(st, i)
    path = str(tmp_path / 'model_1_2.dkpt')
    ck.save_checkpoint(path, jax.device_get(st.params),
                       opt_state=jax.device_get(st.opt), epoch=1, step=2,
                       lr=0.05)
    payload = ck.load_checkpoint(path)
    st2 = train_engine.create_train_state(
        jax.tree.map(jnp.asarray, payload['model']), lr=payload['lr'])
    st2 = train_engine.restore_optimizer(st2, payload['optimizer'])
    for i in range(3, 5):
        st2 = step(st2, i)

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.opt.velocity),
                    jax.tree.leaves(st2.opt.velocity)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_optimizer_none_is_noop():
    from dana_tpu.engine import train as train_engine
    st = train_engine.create_train_state({'w': jnp.ones(3)}, lr=0.1)
    assert train_engine.restore_optimizer(st, None) is st
