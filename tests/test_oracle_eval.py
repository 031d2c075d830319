"""Oracle evaluation protocol smoke: conventional detector + OracleLoader.

The oracle protocol (reference oracle_loader.py:1-229) evaluates a
plain multi-class detector on queries whose ALL-class gt rides along —
no supports.  This drives it end-to-end on synth: OracleLoader ->
frcnn forward -> per-class postprocess -> COCOeval, and separately
proves the metric path by scoring the loader's own gt as detections
(AP == 1).
"""

import numpy as np
import pytest

from dana_tpu.models import dana, frameworks
from dana_tpu.models.layers import to_jnp


@pytest.fixture
def synth(tmp_path, monkeypatch):
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    from dana_tpu.utils.config import cfg_from_list
    cfg_from_list(['TEST.SCALES', '(128,)', 'TEST.MAX_SIZE', '192',
                   'TEST.RPN_PRE_NMS_TOP_N', '200',
                   'TEST.RPN_POST_NMS_TOP_N', '16',
                   'TPU.NMS_MAX_INPUT', '200',
                   'TPU.SIZE_BUCKETS',
                   '[(128, 192), (192, 128), (160, 160)]'])
    from dana_tpu.data.imdb import combined_roidb
    imdb_, roidb, _, _ = combined_roidb('synth_test', training=False,
                                        use_flipped=False)
    return imdb_, roidb


def test_oracle_gt_scores_perfect_ap(synth, tmp_path):
    """Feeding the OracleLoader's gt back as detections must reach
    AP 1.0 — the oracle metric path is sound (coordinates, class ids,
    scale round-trip)."""
    from dana_tpu.data.inference_loader import OracleLoader
    imdb_, roidb = synth
    loader = OracleLoader(roidb, seed=3)
    all_boxes = [[[] for _ in range(len(roidb))]
                 for _ in range(imdb_.num_classes)]
    for i in range(len(roidb)):
        item = loader[i]
        n = int(item['num_boxes'])
        gt = item['gt_boxes'][:n]
        scale = item['im_info'][2]
        for b in gt:
            det = np.array([[b[0] / scale, b[1] / scale,
                             b[2] / scale, b[3] / scale, 0.99]],
                           np.float32)
            cls = int(b[4])
            prev = all_boxes[cls][i]
            all_boxes[cls][i] = det if isinstance(prev, list) and not prev \
                else np.concatenate([prev, det])
    result = imdb_.evaluate_detections(all_boxes, str(tmp_path))
    assert result['stats'][1] > 0.99          # AP50 == 1.0


def test_oracle_protocol_with_frcnn(synth, tmp_path):
    """End-to-end oracle eval of a (random-init) conventional detector:
    multi-class frcnn forward over OracleLoader queries, per-class
    thresholding + NMS, COCOeval runs and returns finite stats."""
    import jax.numpy as jnp
    from dana_tpu.data.inference_loader import OracleLoader
    from dana_tpu.engine.postprocess import postprocess_batch
    imdb_, roidb = synth

    config = dana.DanaConfig(test_pre_nms=200, test_post_nms=16,
                             nms_cap=200)
    params = to_jnp(frameworks.init_frcnn_params(
        config, num_classes=imdb_.num_classes, seed=0,
        class_agnostic=True))
    loader = OracleLoader(roidb, seed=3)

    all_boxes = [[[] for _ in range(len(roidb))]
                 for _ in range(imdb_.num_classes)]
    for i in range(2):                       # smoke: two images
        item = loader[i]
        im = jnp.asarray(item['im_data'])[None]
        info = jnp.asarray(item['im_info'])[None]
        out = frameworks.frcnn_forward(params, config, im, info,
                                       training=False,
                                       class_agnostic=True)
        # class-agnostic boxes scored per class (reference oracle flow)
        for cls in range(1, imdb_.num_classes):
            dets, valid = postprocess_batch(
                out['rois'], out['cls_prob'][..., cls:cls + 1].repeat(
                    2, -1), out['bbox_pred'], info,
                score_thresh=0.0, max_per_image=5)
            d = np.asarray(dets[0])[np.asarray(valid[0])]
            assert np.all(np.isfinite(d))
            all_boxes[cls][i] = d
    result = imdb_.evaluate_detections(all_boxes, str(tmp_path))
    assert np.all(np.isfinite(np.asarray(result['stats'])))
