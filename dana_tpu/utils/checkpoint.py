"""Checkpoint save/load.

Parity surface: the reference saves {'epoch', 'model', 'optimizer',
'pooling_mode'} per epoch via torch.save (train.py:183-189) and restores
lr + POOLING_MODE on resume (train.py:92-102).  We store the same fields
as a pickled tree of numpy arrays at
`<save_dir>/train/checkpoints/model_<epoch>_<step>.dkpt`; reference
`.pth` files load transparently through utils/torch_import.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, params, opt_state=None, epoch=0, step=0,
                    lr=None, pooling_mode='align', extra=None):
    os.makedirs(osp.dirname(path) or '.', exist_ok=True)
    payload = {
        'format': 'dana_tpu_v1',
        'epoch': epoch,
        'step': step,
        'model': _to_numpy(params),
        'optimizer': None if opt_state is None else _to_numpy(opt_state),
        'lr': None if lr is None else float(lr),
        'pooling_mode': pooling_mode,
        'extra': extra or {},
    }
    with open(path, 'wb') as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def load_checkpoint(path):
    """Load ours (.dkpt pickle) or a reference torch .pth (converted)."""
    if path.endswith('.pth'):
        from dana_tpu.utils.torch_import import load_dana_checkpoint
        params, extra = load_dana_checkpoint(path)
        return {'format': 'torch', 'model': params,
                'epoch': extra.get('epoch', 0), 'step': 0,
                'optimizer': None, 'lr': None,
                'pooling_mode': extra.get('pooling_mode', 'align'),
                'extra': extra}
    with open(path, 'rb') as f:
        return pickle.load(f)


def checkpoint_path(save_dir, epoch, step, suffix='dkpt'):
    d = osp.join(save_dir, 'train', 'checkpoints')
    return osp.join(d, f'model_{epoch}_{step}.{suffix}')


def save_net_h5(path, params):
    """HDF5 param dump (parity surface: net_utils.save_net:12-16; flat
    'a.b.c' keys, one dataset per leaf)."""
    import h5py
    flat = {}

    def walk(node, prefix=''):
        for k, v in node.items():
            key = f'{prefix}{k}'
            if isinstance(v, dict):
                walk(v, key + '.')
            else:
                flat[key] = np.asarray(v)
    walk(params)
    os.makedirs(osp.dirname(path) or '.', exist_ok=True)
    with h5py.File(path, 'w') as f:
        for k, v in flat.items():
            f.create_dataset(k, data=v)


def load_net_h5(path):
    """Inverse of save_net_h5 -> nested param tree
    (net_utils.load_net:18-23)."""
    import h5py
    out = {}
    with h5py.File(path, 'r') as f:
        def visit(key, obj):
            if isinstance(obj, h5py.Dataset):
                parts = key.split('.')
                node = out
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = obj[()]
        f.visititems(visit)
    return out
