"""Attention visualization (parity with the reference README's
attention_visualization.jpg): overlays the CISA RPN attention mass each
query position assigns to the support on the query image.

Usage:
  python tools/visualize_attention.py <query.jpg> <support.jpg> <out.jpg> \
      [checkpoint.dkpt|.pth]
"""

import sys

sys.path.insert(0, '/root/repo')

import numpy as np


def attention_map(params, config, query_im, support_im):
    """-> [h, w] attention relevance of each query cell (models/viz.py)."""
    from dana_tpu.data import blob
    from dana_tpu.models.viz import rpn_attention_relevance
    from dana_tpu.utils.config import cfg

    q, info = blob.query_blob(query_im, cfg.PIXEL_MEANS)
    sh, sw = support_im.shape[:2]
    s = blob.support_blob(support_im, [0, 0, sw - 1, sh - 1],
                          cfg.PIXEL_MEANS)
    return rpn_attention_relevance(params, config, q, s), info


def main():
    import cv2
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp
    from dana_tpu.utils import checkpoint as ck

    q_path, s_path, out_path = sys.argv[1:4]
    config = dana.DanaConfig(n_way=2, n_shot=1)
    if len(sys.argv) > 4:
        payload = ck.load_checkpoint(sys.argv[4])
        params = to_jnp(payload['model'])
    else:
        params = to_jnp(dana.init_params(config, seed=0))

    query = cv2.imread(q_path).astype(np.float32)
    support = cv2.imread(s_path).astype(np.float32)
    rel, info = attention_map(params, config, query, support)
    rel = (rel - rel.min()) / (np.ptp(rel) + 1e-9)
    heat = cv2.applyColorMap((rel * 255).astype(np.uint8),
                             cv2.COLORMAP_JET)
    heat = cv2.resize(heat, (query.shape[1], query.shape[0]))
    overlay = (0.5 * query + 0.5 * heat).astype(np.uint8)
    cv2.imwrite(out_path, overlay)
    print(f'wrote {out_path}')


if __name__ == '__main__':
    main()
