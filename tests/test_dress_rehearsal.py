"""CI-scale dress rehearsal (VERDICT r2 item 2): the exact reference
directory layouts + the README's verbatim entry commands, end-to-end on
a synthetic COCO-layout tree.  Shapes shrunk via appended overrides
(argparse last-wins keeps the verbatim flags in place).
"""

import os
import os.path as osp
import subprocess
import sys

import jax
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 4,
                                 reason='needs multi-device CPU platform')]


def test_rehearsal_tree_and_pth_roundtrip(tmp_path):
    from tools import dress_rehearsal as dr
    root = str(tmp_path)
    dr.build_tree(root, fast=True)
    # exact reference paths exist (coco_split.py:68-82, README.md:60-100)
    for rel in ('data/coco/annotations/coco60_train/instances_set1.json',
                'data/coco/annotations/coco20_evaluate/instances_set1.json',
                'data/coco/annotations/ft/instances_shot30.json',
                'data/coco/images/train2014', 'data/coco/images/val2014',
                'data/supports'):
        assert osp.exists(osp.join(root, rel)), rel
    # file-name schema COCO_<split>_%012d.jpg
    names = os.listdir(osp.join(root, 'data/coco/images/val2014'))
    assert names and all(n.startswith('COCO_val2014_')
                         and len(n) == len('COCO_val2014_') + 12 + 4
                         for n in names)
    # reference-format .pth round-trips through our loader exactly
    pth = dr.write_reference_pth(root, fast=True)
    assert pth.endswith('model_4_299.pth')


def test_rehearsal_verbatim_commands(tmp_path):
    """The README train + inference commands run end-to-end against the
    reference layouts (the full last mile minus real pixels)."""
    from tools import dress_rehearsal as dr
    root = str(tmp_path)
    dr.build_tree(root, fast=True)
    dr.write_reference_pth(root, fast=True)
    dr.run_cmd(dr.TRAIN_CMD, root, fast=True)
    ck = osp.join(root, 'models', 'DAnA', 'train', 'checkpoints')
    assert os.listdir(ck)
    dr.run_cmd(dr.INFER_CMD, root, fast=True)
    assert osp.exists(osp.join(root, 'dana', 'detections.pkl'))
