"""Finetune-flow end-to-end CLI smoke (VERDICT r2 item 6).

Drives `train.main --fs` on the synthetic set: supports come from a
directory pool (FinetuneLoader — reference finetune_loader.py:99-149)
and only the detection heads train (finetune_mask — reference
FasterRCNN.finetune, faster_rcnn.py:192-204).  Asserts the trunk stayed
FROZEN and the heads MOVED — the protocol that produced the released
cisa_coco_ft30 checkpoint.
"""

import os.path as osp
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason='needs multi-device CPU platform')


def _make_support_dirs(root, class_names, hw=(96, 96)):
    """data/supports/<cls>/*.jpg layout (reference README supports dir)."""
    import cv2
    from dana_tpu.data.synth import _CLASS_COLORS
    rng = np.random.default_rng(7)
    for name in class_names:
        if name == '__background__':
            continue
        d = osp.join(root, name)
        import os
        os.makedirs(d, exist_ok=True)
        for i in range(2):
            im = rng.integers(0, 60, (*hw, 3)).astype(np.uint8)
            color = _CLASS_COLORS.get(name, (128, 128, 128))
            cv2.rectangle(im, (10, 10), (80, 80),
                          tuple(int(c) for c in color), -1)
            cv2.imwrite(osp.join(d, f'shot_{i}.jpg'), im)


def test_finetune_cli_freezes_trunk_moves_heads(tmp_path, monkeypatch):
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    save_dir = str(tmp_path / 'run')
    sup_dir = str(tmp_path / 'supports')

    import train as train_cli
    from utils import parse_args, load_cfg, get_model

    argv = [
        '--dataset', 'synth_test', '--net', 'DAnA', '--backbone', 'res50',
        '--fs', '--sup_dir', sup_dir,
        '--bs', '2', '--epochs', '1', '--way', '2', '--shot', '1',
        '--lr', '0.001', '--disp_interval', '1', '--dlog',
        '--save_dir', save_dir, '--seed', '3',
        '--set',
        'TRAIN.SCALES', '(128,)', 'TRAIN.MAX_SIZE', '192',
        'TRAIN.RPN_PRE_NMS_TOP_N', '300', 'TRAIN.RPN_POST_NMS_TOP_N', '48',
        'TRAIN.RPN_BATCHSIZE', '64', 'TRAIN.BATCH_SIZE', '32',
        'TPU.NMS_MAX_INPUT', '300',
        'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
    ]

    # the synth class names come from the registered imdb
    args = parse_args(argv)
    load_cfg(args)
    from dana_tpu.data.imdb import combined_roidb
    imdb_, _, _, _ = combined_roidb(args.imdb_name, use_flipped=False)
    _make_support_dirs(sup_dir, imdb_.classes)

    train_cli.main(argv)

    import os
    ckpts = os.listdir(osp.join(save_dir, 'train', 'checkpoints'))
    assert any(c.startswith('model_1_') for c in ckpts), ckpts
    from dana_tpu.utils import checkpoint as ckpt_lib
    payload = ckpt_lib.load_checkpoint(
        osp.join(save_dir, 'train', 'checkpoints', sorted(ckpts)[-1]))
    trained = payload['model']

    # identical init (same seed/args) for the frozen/moved comparison
    _, init_params = get_model(args.net, way=args.way, shot=args.shot,
                               net=args.backbone, seed=args.seed)

    from dana_tpu.engine import optim
    ft = optim.finetune_mask(init_params)
    head_moved, frozen_ok = [], True
    for (path, a), b, m in zip(
            jax.tree_util.tree_flatten_with_path(init_params)[0],
            jax.tree.leaves(trained), jax.tree.leaves(ft)):
        a, b = np.asarray(a), np.asarray(b)
        if m:
            head_moved.append(not np.allclose(a, b))
        else:
            frozen_ok &= bool(np.array_equal(a, b))
    assert frozen_ok, 'a frozen (non-head) param moved during --fs run'
    assert any(head_moved), 'no head param moved during --fs run'
