"""Demo-path helpers: run_detection, pseudo-labels, annotation writer.

Parity surfaces: reference utils.py run_detection:241-278,
generate_pseudo_label:182-204, create_annotation:130-179,
support/query preprocessing:207-239.
"""

import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import utils as cli_utils  # noqa: E402
from dana_tpu.models import dana  # noqa: E402
from dana_tpu.models.layers import to_jnp  # noqa: E402
from dana_tpu.utils.config import cfg, cfg_from_list  # noqa: E402

CFG = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=200,
                      train_post_nms=32, test_pre_nms=200,
                      test_post_nms=16, nms_cap=200)


def _shrink_cfg():
    cfg_from_list(['TRAIN.SCALES', '(96,)', 'TRAIN.MAX_SIZE', '128',
                   'TEST.SCALES', '(96,)', 'TEST.MAX_SIZE', '128'])


def test_preprocess_shapes():
    _shrink_cfg()
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (100, 140, 3)).astype(np.float32)
    sup = cli_utils.support_im_preprocess(im, cfg, n_of_shot=2)
    assert sup.shape == (2, 320, 320, 3)
    q, info = cli_utils.query_im_preprocess(im, cfg)
    # exact reference scaling: shortest-side-96, NO long-side cap (the
    # reference comments the MAX_SIZE cap out, blob.py:44-46); info holds
    # the real extent, q is the static bucket canvas
    assert (info[0], info[1]) == (96, 134)
    np.testing.assert_allclose(info[2], 96 / 100, rtol=1e-5)
    assert q.shape[0] >= 96 and q.shape[1] >= 134

    # the capped py-faster-rcnn behavior stays available as a knob
    try:
        cfg.TPU.EXACT_QUERY_SCALE = False
        q2, info2 = cli_utils.query_im_preprocess(im, cfg)
        assert (info2[0], info2[1]) == (91, 128)
        np.testing.assert_allclose(info2[2], 128 / 140, rtol=1e-5)
    finally:
        cfg.TPU.EXACT_QUERY_SCALE = True


def test_run_detection_and_pseudo_label(tmp_path):
    _shrink_cfg()
    params = to_jnp(dana.init_params(CFG, seed=0))
    rng = np.random.default_rng(1)
    sp = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    q = rng.integers(0, 255, (100, 140, 3)).astype(np.float32)
    dets = cli_utils.run_detection(sp, q, CFG, params, thresh=0.0)
    assert dets.ndim == 2 and dets.shape[1] == 5
    assert np.all(np.isfinite(dets))

    # pseudo-label path: shots on disk -> union + NMS
    from PIL import Image
    sp_dir = str(tmp_path / 'sp')
    os.makedirs(sp_dir)
    for i in (1, 2):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(
            osp.join(sp_dir, f'shot_{i}.jpg'))
    qp = str(tmp_path / 'q.jpg')
    Image.fromarray(q.astype(np.uint8)).save(qp)
    out = cli_utils.generate_pseudo_label(str(tmp_path / 'out'), sp_dir,
                                          qp, CFG, params, num_shot=2)
    assert out.ndim == 2 and out.shape[1] == 5


def test_create_annotation(tmp_path):
    nd_dir = str(tmp_path / 'nd')
    os.makedirs(nd_dir)
    np.save(osp.join(nd_dir, '000003.npy'),
            np.array([[10, 20, 50, 70], [5, 5, 30, 40]], np.float32))
    dump = str(tmp_path / 'ann.json')
    cli_utils.create_annotation(nd_dir, ['mug'], [[3]], dump)
    with open(dump) as f:
        ann = json.load(f)
    assert ann['categories'][0]['name'] == 'mug'
    assert len(ann['images']) == 1 and len(ann['annotations']) == 2
    a = ann['annotations'][0]
    assert a['bbox'] == [10, 20, 40, 50]
    assert a['category_id'] == 1 and a['image_id'] == 3
