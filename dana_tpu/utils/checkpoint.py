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
                    lr=None, pooling_mode='align', extra=None,
                    backend='pickle'):
    """Write a checkpoint.

    backend='pickle' (default): single-file numpy-tree pickle.
    backend='orbax': Orbax PyTreeCheckpointer directory at `path.odir`
      (async-capable, sharded-array-aware saves for multi-host runs);
      scalars/metadata ride in a sidecar `_meta` entry.
    """
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
    if backend == 'orbax':
        return _save_orbax(path, payload)
    with open(path, 'wb') as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def _orbax_dir(path):
    return path if path.endswith('.odir') else path + '.odir'


def _save_orbax(path, payload):
    import orbax.checkpoint as ocp
    d = osp.abspath(_orbax_dir(path))
    # NamedTuple opt state -> plain dict for PyTree round-trip stability
    opt = payload['optimizer']
    if opt is not None and hasattr(opt, '_asdict'):
        opt = dict(opt._asdict())
    tree = {'model': payload['model']}
    if opt is not None:
        tree['optimizer'] = opt
    meta = {k: payload[k] for k in
            ('format', 'epoch', 'step', 'lr', 'pooling_mode', 'extra')}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(d, {'tree': tree, 'meta': meta}, force=True)
    return d


def _load_orbax(path):
    import orbax.checkpoint as ocp
    d = osp.abspath(_orbax_dir(path))
    with ocp.PyTreeCheckpointer() as ckptr:
        got = ckptr.restore(d)
    meta = got['meta']
    out = {
        'format': meta.get('format', 'dana_tpu_v1'),
        'epoch': meta.get('epoch', 0), 'step': meta.get('step', 0),
        'model': got['tree']['model'],
        'optimizer': got['tree'].get('optimizer'),
        'lr': meta.get('lr'), 'pooling_mode': meta.get('pooling_mode',
                                                       'align'),
        'extra': meta.get('extra') or {},
    }
    return out


def load_checkpoint(path):
    """Load ours (.dkpt pickle / .odir Orbax dir) or a reference torch
    .pth (converted)."""
    if path.endswith('.pth'):
        from dana_tpu.utils.torch_import import load_dana_checkpoint
        params, extra = load_dana_checkpoint(path)
        return {'format': 'torch', 'model': params,
                'epoch': extra.get('epoch', 0), 'step': 0,
                'optimizer': None, 'lr': None,
                'pooling_mode': extra.get('pooling_mode', 'align'),
                'extra': extra}
    if path.endswith('.odir') or osp.isdir(path):
        return _load_orbax(path)
    if not osp.exists(path) and osp.isdir(path + '.odir'):
        # standard resume path (checkpoint_path() names the pickle file)
        # pointing at a checkpoint written with backend='orbax'
        return _load_orbax(path + '.odir')
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
