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
