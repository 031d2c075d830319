"""Measure the TPU.NMS_MAX_INPUT=6000 approximation (VERDICT r2 item 7).

The reference's TRAIN proposal path sorts ~28k anchor boxes, takes the
top 12000 by score, NMSes them, and keeps 2000
(proposal_layer.py:135-190).  Our fixed-shape NMS caps its input at
nms_cap=6000 (utils/config.py TPU.NMS_MAX_INPUT) — boxes ranked
6001..12000 never enter NMS.  This tool quantifies what that truncation
costs with TRAINED weights (random-init scores would make the ranking
meaningless): ground-truth recall@IoU of the kept proposals and the
kept-set overlap, cap 6000 vs a true 12000.

Run (CPU):  JAX_PLATFORMS='' PYTHONPATH=/root/repo \
            python tools/nms_cap_study.py .scratch/synth_final_res50.dkpt
Result recorded in PERF.md ("nms_cap truncation measurement").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() not in ('cpu', 'tpu'):
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

import utils as _cli
_cli.enable_compilation_cache()

from dana_tpu.utils.config import cfg_from_list

# Reference TEST scale 600: synth 480x640 images land on (608, 1024)
# canvases -> 38x64 feature grid -> ~29k anchors, so the pre-NMS
# top-12000 and the 6000 cap genuinely differ (at synth's native 304
# scale only 7.3k anchors exist and the cap never binds: measured
# recall delta exactly 0 there).
cfg_from_list(['TEST.SCALES', '(600,)'])

from dana_tpu.core.boxes import iou_matrix
from dana_tpu.data.imdb import combined_roidb
from dana_tpu.data.inference_loader import SupportPool
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp
from dana_tpu.utils import checkpoint as ck


def proposal_recall(rois, gts, thr=0.5):
    """Fraction of gt boxes covered at IoU>=thr by any proposal."""
    if not len(gts):
        return None
    ious = np.asarray(iou_matrix(jnp.asarray(rois[:, 1:5]),
                                 jnp.asarray(gts[:, :4])))
    return float((ious.max(axis=0) >= thr).mean())


def main(ckpt='.scratch/synth_final_res50.dkpt', n_images=8, shot=2):
    imdb_tr, roidb_tr, _, _ = combined_roidb('synth_train', training=False,
                                             use_flipped=False)
    imdb_te, roidb_te, _, _ = combined_roidb('synth_test', training=False,
                                             use_flipped=False)
    payload = ck.load_checkpoint(ckpt)
    params = to_jnp(payload['model'])
    pool = SupportPool(imdb_te.classes, shot, support_roidb=roidb_tr,
                       seed=0)
    from dana_tpu.data.inference_loader import InferenceLoader
    loader = InferenceLoader(roidb_te, pool)

    results = {}
    # TRAIN-path proposal budget (12000 -> NMS -> 2000), applied through
    # the TEST knobs so forward(training=False) runs it without targets
    for cap in (6000, 12000):
        config = dana.DanaConfig(
            n_way=2, n_shot=shot, arch='resnet50',
            anchor_scales=(4, 8, 16, 32),
            test_pre_nms=12000, test_post_nms=2000, nms_cap=cap)

        @jax.jit
        def fwd(params, im, info, sup):
            return dana.forward(params, config, im, info, sup,
                                training=False)['rois']

        recalls, kept = [], []
        for i in range(min(n_images, len(loader))):
            item = loader[i]
            rois = np.asarray(fwd(
                params, jnp.asarray(item['im_data'])[None],
                jnp.asarray(item['im_info'])[None],
                jnp.asarray(item['support_ims'])[None]))[0]
            gts = item['gt_boxes'][:int(item['num_boxes'])]
            r = proposal_recall(rois, gts)
            if r is not None:
                recalls.append(r)
            kept.append(rois[:, 1:5])
        results[cap] = (float(np.mean(recalls)), kept)
        print(f'nms_cap={cap:6d}: proposal recall@0.5 = '
              f'{results[cap][0]:.4f} over {len(recalls)} images',
              flush=True)

    # kept-set agreement between the two caps (IoU>=0.9 proposal match)
    agree = []
    for a, b in zip(results[6000][1], results[12000][1]):
        ious = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
        agree.append(float((ious.max(axis=1) >= 0.9).mean()))
    print(f'kept-proposal agreement (IoU>=0.9): {np.mean(agree):.4f}')
    d = results[12000][0] - results[6000][0]
    print(f'recall delta (12000 minus 6000): {d:+.4f}')
    return results


if __name__ == '__main__':
    main(*sys.argv[1:2])
