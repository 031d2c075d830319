"""Attention visualization utilities.

Parity target: the reference README's attention_visualization.jpg — the
CISA RPN attention mass each query position assigns to the support image
(reference dana.py:140-146 intermediate, which the torch code only
exposed through notebook eyeballing).  Shared by
tools/visualize_attention.py and FSODInferenceLogger.write_attention.
"""

from __future__ import annotations

import math

import numpy as np


def rpn_attention_relevance(params, config, query_blob, support_blob):
    """CISA RPN attention relevance map.

    Args:
      query_blob: [H, W, 3] preprocessed query (BGR, mean-subtracted).
      support_blob: [sh, sw, 3] (or [n, sh, sw, 3]) preprocessed supports.

    Returns [h, w] float relevance (peakiness of each query cell's
    support attention) at feature-map resolution (stride 16).
    """
    import jax
    import jax.numpy as jnp
    from dana_tpu.models import dana
    from dana_tpu.models import layers as L

    sup = np.asarray(support_blob)
    if sup.ndim == 3:
        sup = sup[None]
    base = dana.backbone_base(params, config,
                              jnp.asarray(query_blob)[None])
    sfeat = dana.backbone_base(params, config, jnp.asarray(sup))
    b, h, w, c = base.shape
    q_tokens = base.reshape(1, h * w, c)
    n, sh, sw = sfeat.shape[0], sfeat.shape[1], sfeat.shape[2]
    # per-shot token sequences, exactly as the model builds them
    # (_support_tokens): PE 0..Ns-1 PER SHOT, centering/softmax per shot
    s_tokens = sfeat.reshape(1, n, sh * sw, c)
    if config.pos_encoding:
        pe = jnp.asarray(dana.positional_encoding(sh * sw,
                                                  config.feat_dim))
        s_tokens = s_tokens + pe
    qm = L.linear(q_tokens, params['rpn_adapt_q_layer'])
    qm = qm - qm.mean(axis=-2, keepdims=True)
    km = L.linear(s_tokens, params['rpn_adapt_k_layer'])
    km = km - km.mean(axis=-2, keepdims=True)          # center per shot
    attn = jax.nn.softmax(
        jnp.einsum('bqd,bskd->bsqk', qm, km)
        / math.sqrt(config.rpn_reduce_dim), axis=-1)   # softmax per shot
    # peakiness of each query cell's support attention, averaged over
    # shots (the model means its attended feature over shots)
    return np.asarray(attn.max(axis=-1).mean(axis=1)[0].reshape(h, w))


def overlay_heatmap(im_rgb, heat, alpha=0.5):
    """Overlay a [h, w] heatmap (any scale) on an [H, W, 3] uint8 image
    as red intensity; nearest-neighbor upsampling, no cv2 dependency."""
    im = np.asarray(im_rgb).astype(np.float32)
    H, W = im.shape[:2]
    h, w = heat.shape
    heat = np.asarray(heat, np.float32)
    rng = heat.max() - heat.min()
    heat = (heat - heat.min()) / (rng if rng > 0 else 1.0)
    ys = np.clip((np.arange(H) * h) // max(H, 1), 0, h - 1)
    xs = np.clip((np.arange(W) * w) // max(W, 1), 0, w - 1)
    up = heat[np.ix_(ys, xs)]
    out = im.copy()
    out[..., 0] = (1 - alpha * up) * im[..., 0] + alpha * up * 255.0
    out[..., 1] = (1 - alpha * up) * im[..., 1]
    out[..., 2] = (1 - alpha * up) * im[..., 2]
    return np.clip(out, 0, 255).astype(np.uint8)
