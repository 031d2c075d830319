"""Attention visualization: relevance map + logger dump.

Covers models/viz.py (the CISA RPN attention intermediate the reference
only exposed through notebook eyeballing) and
FSODInferenceLogger.write_attention.
"""

import numpy as np

from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp

CFG = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=200,
                      train_post_nms=32, test_pre_nms=200,
                      test_post_nms=16, nms_cap=200)


def test_rpn_attention_relevance_shape_and_range():
    from dana_tpu.models.viz import rpn_attention_relevance
    params = to_jnp(dana.init_params(CFG, seed=0))
    rng = np.random.default_rng(0)
    q = rng.normal(size=(128, 160, 3)).astype(np.float32) * 10
    s = rng.normal(size=(224, 224, 3)).astype(np.float32) * 10
    heat = rpn_attention_relevance(params, CFG, q, s)
    assert heat.shape == (128 // 16, 160 // 16)
    assert np.all(np.isfinite(heat))
    # softmax rows: max-probability peakiness lives in (0, 1]
    assert heat.min() > 0.0 and heat.max() <= 1.0


def test_overlay_heatmap_upsamples():
    from dana_tpu.models.viz import overlay_heatmap
    im = np.zeros((64, 96, 3), np.uint8)
    heat = np.zeros((4, 6), np.float32)
    heat[1, 2] = 1.0
    out = overlay_heatmap(im, heat)
    assert out.shape == im.shape and out.dtype == np.uint8
    # the hot cell turned red; a cold cell stayed black
    assert out[20, 40, 0] > 100 and out[0, 0, 0] == 0


def test_inference_logger_write_attention(tmp_path):
    from dana_tpu.utils.fsod_logger import FSODInferenceLogger
    params = to_jnp(dana.init_params(CFG, seed=0))
    logger = FSODInferenceLogger(str(tmp_path / 'tb'))
    rng = np.random.default_rng(1)
    batch = {
        'im_data': rng.normal(size=(1, 128, 160, 3)).astype(np.float32),
        'support_ims': rng.normal(
            size=(1, 1, 224, 224, 3)).astype(np.float32),
    }
    im = logger.write_attention(3, params, CFG, batch)
    assert im.shape == (128, 160, 3)
    assert any(tag == 'attention' for _, tag, _ in logger._images)
