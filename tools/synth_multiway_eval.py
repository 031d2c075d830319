"""N-way episodic evaluation (the reference's MultiwayLoader protocol,
BASELINE config #4 shape: 5-way K-shot).

For each test image, stacks supports of `way` classes (classes present
in the image first, padded with absent ones) and runs the detector once
per way; detections are labeled with their way's class and evaluated
jointly with COCOeval.

Usage: python tools/synth_multiway_eval.py <ckpt.dkpt> [way] [shot]
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import utils as _cli_utils; _cli_utils.enable_compilation_cache()  # persistent XLA cache
import jax.numpy as jnp

from dana_tpu.utils.config import cfg_from_list

cfg_from_list([
    'TEST.RPN_PRE_NMS_TOP_N', '600', 'TEST.RPN_POST_NMS_TOP_N', '64',
    'TPU.NMS_MAX_INPUT', '600',
    'TEST.SCALES', '(304,)', 'TEST.MAX_SIZE', '512',
    'TPU.SIZE_BUCKETS', '[(304, 512), (512, 304), (416, 416)]'])

from dana_tpu.data.imdb import combined_roidb
from dana_tpu.data.inference_loader import MultiwayLoader, SupportPool
from dana_tpu.engine.postprocess import postprocess_batch
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp
from dana_tpu.utils import checkpoint as ck


def main(ckpt_path, way=5, shot=2, arch='resnet50'):
    imdb_tr, roidb_tr, _, _ = combined_roidb('synth_train', training=False,
                                             use_flipped=False)
    imdb_te, roidb_te, _, _ = combined_roidb('synth_test', training=False,
                                             use_flipped=False)
    payload = ck.load_checkpoint(ckpt_path)
    params = to_jnp(payload['model'])
    config = dana.DanaConfig(
        n_way=way, n_shot=shot, arch=arch, anchor_scales=(4, 8, 16, 32),
        test_pre_nms=600, test_post_nms=64, nms_cap=600)

    pool = SupportPool(imdb_te.classes, shot, support_roidb=roidb_tr,
                       seed=0)
    loader = MultiwayLoader(roidb_te, pool, num_way=way)

    @jax.jit
    def predict(params, im, info, sup):
        out = dana.forward(params, config, im, info, sup, training=False)
        return postprocess_batch(out['rois'], out['cls_prob'],
                                 out['bbox_pred'], info,
                                 max_per_image=100 // way)

    all_boxes = [[[] for _ in range(len(roidb_te))]
                 for _ in range(imdb_te.num_classes)]
    t0 = time.time()
    for i in range(len(roidb_te)):
        item = loader[i]
        sup = item['support_ims'].reshape(way, shot,
                                          *item['support_ims'].shape[1:])
        for wi, cls in enumerate(item['selected_ways']):
            dets, valid = predict(params,
                                  jnp.asarray(item['im_data'])[None],
                                  jnp.asarray(item['im_info'])[None],
                                  jnp.asarray(sup[wi])[None])
            d = np.asarray(dets[0])[np.asarray(valid[0])]
            all_boxes[int(cls)][i] = d
    print(f'{len(roidb_te)} images x {way} ways in '
          f'{time.time() - t0:.1f}s', flush=True)
    result = imdb_te.evaluate_detections(all_boxes,
                                         '/root/repo/.scratch/multiway')
    print(f'{way}-way {shot}-shot AP:', round(result['stats'][0], 4),
          'AP50:', round(result['stats'][1], 4))
    return result


if __name__ == '__main__':
    main(sys.argv[1],
         int(sys.argv[2]) if len(sys.argv) > 2 else 5,
         int(sys.argv[3]) if len(sys.argv) > 3 else 2,
         sys.argv[4] if len(sys.argv) > 4 else 'resnet50')

# Results (TPU v5e, checkpoints from synth_train_eval on synth_train_big):
#   48k steps (~15 min): 5-way 2-shot AP 0.749, AP50 0.882 on synth_test
#  144k steps (~42 min): 5-way 2-shot AP 0.811, AP50 0.910 (round-1 code)
#  round 2 (shot-fused kernels): 144k steps AP 0.749 / AP50 0.913;
#  288k steps (~75 min) AP 0.761 / AP50 0.928 (best);
#  ResNet-101 72k steps, 5-way 5-shot: AP 0.734 / AP50 0.900
# Note: the single-way protocol's lower AP (0.34) is bookkeeping — it
# scores one target class per image while our synth annotations contain
# all classes, so unevaluated (image, class) pairs count as missed gts;
# the reference sidesteps this with per-class eval annotation packs.
