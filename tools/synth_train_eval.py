"""End-to-end capability run on the synthetic dataset (TPU).

Trains DAnA from random init on synth_train (60 images, 8 classes,
2-way 2-shot episodes) with scan-staged steps, then evaluates
synth_test with the full inference + COCOeval pipeline and prints AP.

Usage: python tools/synth_train_eval.py [epochs] (default 20)
"""

import os
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import utils as _cli_utils; _cli_utils.enable_compilation_cache()  # persistent XLA cache
import jax.numpy as jnp

from dana_tpu.utils.config import cfg_from_list

cfg_from_list([
    'TRAIN.RPN_PRE_NMS_TOP_N', '600', 'TRAIN.RPN_POST_NMS_TOP_N', '128',
    'TEST.RPN_PRE_NMS_TOP_N', '600', 'TEST.RPN_POST_NMS_TOP_N', '64',
    'TPU.NMS_MAX_INPUT', '600',
    'TRAIN.SCALES', '(304,)', 'TRAIN.MAX_SIZE', '512',
    'TEST.SCALES', '(304,)', 'TEST.MAX_SIZE', '512',
    'TRAIN.BATCH_SIZE', '32',
    'TPU.SIZE_BUCKETS', '[(304, 512), (512, 304), (416, 416)]'])

from dana_tpu.data.imdb import combined_roidb
from dana_tpu.data.fs_loader import FewShotLoader
from dana_tpu.data.inference_loader import InferenceLoader, SupportPool
from dana_tpu.engine import optim, train as te
from dana_tpu.engine.postprocess import postprocess_batch
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp


def main(epochs=20, train_name='synth_train', test_name='synth_test',
         arch='resnet50', dtype='f32', seed=0):
    """`seed` varies EVERYTHING stochastic: param init, the episodic
    support draws, and the per-step PRNG stream — so a seed sweep
    (tools/seed_sweep.py) measures genuine run-to-run variance."""
    imdb_tr, roidb_tr, _, _ = combined_roidb(train_name, training=False,
                                             use_flipped=False)
    # dtype='bf16': the production mixed-precision recipe — bf16 trunk,
    # f32 head island, f32 master params/optimizer (PERF.md "bf16
    # compute and AP"); eval runs the same config.
    dt = dict(compute_dtype=jnp.bfloat16, head_dtype=jnp.float32) \
        if dtype == 'bf16' else {}
    config = dana.DanaConfig(
        n_way=2, n_shot=2, arch=arch, anchor_scales=(4, 8, 16, 32),
        train_pre_nms=600, train_post_nms=128, test_pre_nms=600,
        test_post_nms=64, nms_cap=600, rois_per_image=32, **dt)
    params = to_jnp(dana.init_params(config, seed=seed))
    trainable = optim.trainable_mask(params)
    state = te.create_train_state(params, 2e-3)

    # stage 2 episode variants per image (different support draws)
    t0 = time.time()
    stacks = []
    for ep_seed in (7 + 1000 * seed, 8 + 1000 * seed):
        loader = FewShotLoader(roidb_tr, imdb_tr.num_classes, num_way=2,
                               num_shot=2, seed=ep_seed)
        eps = [loader[i] for i in range(len(roidb_tr))]
        stacks.append({k: np.stack([e[k] for e in eps])
                       for k in ('im_data', 'im_info', 'gt_boxes',
                                 'support_ims')})
    batches = {k: np.concatenate([s[k] for s in stacks])[:, None]
               for k in stacks[0]}
    # stage images FLAT: any [..., small]-trailing scan operand gets
    # lane-padded (3->128) in TPU tiled layout — 42x HBM inflation, and
    # XLA hoists the relayout of the whole stack out of the loop (a
    # 480-episode stack tried to allocate 50 GB).  A flat trailing dim
    # tiles exactly; the per-step reshape happens on one slice in-loop.
    im_shape = batches['im_data'].shape[1:]
    sup_shape = batches['support_ims'].shape[1:]
    k_eps = batches['im_data'].shape[0]
    batches['im_data'] = batches['im_data'].reshape(k_eps, -1)
    batches['support_ims'] = batches['support_ims'].reshape(k_eps, -1)
    batches = {k: jnp.asarray(v) for k, v in batches.items()}   # [120, 1(bs), ...]
    print(f'staged {batches["im_data"].shape[0]} episodes '
          f'in {time.time() - t0:.0f}s', flush=True)

    def loss(params, ep, rng):
        # cut backward at frozen leaves (engine/train.py does the same):
        # without this the scan materializes conv1/bn1/layer1 backward
        # it then throws away (~1.7x step cost, PERF.md round 3)
        params = jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p),
            params, trainable)
        ep = dict(ep,
                  im_data=ep['im_data'].reshape(im_shape),
                  support_ims=ep['support_ims'].reshape(sup_shape))
        return te.loss_fn(params, config, ep, rng)

    # batches MUST be an argument, not a closure: closed-over arrays
    # become jit constants and an 800MB constant pool wedges the remote
    # compiler for tens of minutes
    @jax.jit
    def epoch_fn(state, batches, rng):
        def body(st, ep):
            key = jax.random.fold_in(rng, st.step)
            (_, m), g = jax.value_and_grad(loss, has_aux=True)(
                st.params, ep, key)
            g = optim.clip_gradients(g, 10.0, trainable=trainable)
            p2, o2 = optim.sgd_update(st.params, g, st.opt,
                                      trainable=trainable)
            return te.TrainState(p2, o2, st.step + 1), m['loss']
        st, losses = jax.lax.scan(body, state, batches)
        return st, losses.mean()

    batches = jax.device_put(batches)
    rng = jax.random.PRNGKey(seed)
    t0 = time.time()
    from dana_tpu.utils import checkpoint as ck
    for e in range(epochs):
        if e == epochs * 3 // 4:
            state = state._replace(opt=state.opt._replace(
                lr=state.opt.lr * 0.1))
        state, ml = epoch_fn(state, batches, jax.random.fold_in(rng, e))
        if e % 2 == 0 or e == epochs - 1:
            print(f'epoch {e}: loss {float(ml):.4f} '
                  f'[{time.time() - t0:.0f}s]', flush=True)
        if e and e % 100 == 0:
            # periodic save: a wedged TPU tunnel must not cost the
            # whole run (the remote link can stall for good mid-run)
            ck.save_checkpoint('/root/repo/.scratch/synth_partial.dkpt',
                               jax.device_get(state.params), epoch=e)

    out_ckpt = os.environ.get('SYNTH_OUT_CKPT',
                              '/root/repo/.scratch/synth_final.dkpt')
    ck.save_checkpoint(out_ckpt, jax.device_get(state.params),
                       epoch=epochs)

    # ---------------- eval ----------------
    imdb_te, roidb_te, _, _ = combined_roidb(test_name, training=False,
                                             use_flipped=False)
    pool = SupportPool(imdb_te.classes, 2, support_roidb=roidb_tr, seed=0)
    loader = InferenceLoader(roidb_te, pool)

    @jax.jit
    def predict(params, im, info, sup):
        out = dana.forward(params, config, im, info, sup, training=False)
        return postprocess_batch(out['rois'], out['cls_prob'],
                                 out['bbox_pred'], info)

    all_boxes = [[[] for _ in range(len(roidb_te))]
                 for _ in range(imdb_te.num_classes)]
    for i in range(len(roidb_te)):
        it = loader[i]
        dets, valid = predict(state.params,
                              jnp.asarray(it['im_data'])[None],
                              jnp.asarray(it['im_info'])[None],
                              jnp.asarray(it['support_ims'])[None])
        d = np.asarray(dets[0])[np.asarray(valid[0])]
        all_boxes[int(it['target_cls'])][i] = d
    result = imdb_te.evaluate_detections(all_boxes,
                                         '/root/repo/.scratch/synth_ap')
    print('FINAL AP:', round(result['stats'][0], 4),
          'AP50:', round(result['stats'][1], 4), flush=True)
    return result


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         *(sys.argv[2:6] or ()))

# Results (TPU v5e, random init, 2-way 2-shot, 60 train images):
#   30 epochs (3.6k steps, ~4 min):  AP 0.139  AP50 0.202
#  100 epochs (12k steps, ~5 min):   AP 0.227  AP50 0.307
# Full pipeline: episodic training -> checkpoint -> inference -> COCOeval.
