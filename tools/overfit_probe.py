import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from dana_tpu.utils.config import cfg, cfg_from_list
cfg_from_list(['TEST.RPN_PRE_NMS_TOP_N','600','TEST.RPN_POST_NMS_TOP_N','64',
               'TRAIN.RPN_PRE_NMS_TOP_N','600','TRAIN.RPN_POST_NMS_TOP_N','128',
               'TPU.NMS_MAX_INPUT','600','TEST.SCALES','(304,)','TEST.MAX_SIZE','512',
               'TRAIN.SCALES','(304,)','TRAIN.MAX_SIZE','512',
               'TRAIN.BATCH_SIZE','32',
               'TPU.SIZE_BUCKETS','[(304, 512), (512, 304), (416, 416)]'])
from dana_tpu.data.imdb import combined_roidb
from dana_tpu.data.fs_loader import FewShotLoader
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp
from dana_tpu.engine import train as te, optim
from dana_tpu.engine.postprocess import postprocess_batch
from dana_tpu.core.boxes import iou_matrix

imdb_, roidb, _, _ = combined_roidb('synth_train', training=False, use_flipped=False)
loader = FewShotLoader(roidb, imdb_.num_classes, num_way=2, num_shot=2, seed=7)
# episodes only from the first 4 images
eps = [loader[i] for i in [0,1,2,3]*4]
batch = {k: jnp.asarray(np.stack([e[k] for e in eps])) for k in
         ('im_data','im_info','gt_boxes','support_ims')}  # [16, 1-like...]
batch = {k: v[:, None] if k != 'im_info' else v[:, None] for k, v in batch.items()}
# -> each scan element is a bs=1 batch
config = dana.DanaConfig(n_way=2, n_shot=2, anchor_scales=(4,8,16,32),
    train_pre_nms=600, train_post_nms=128, test_pre_nms=600, test_post_nms=64,
    nms_cap=600, rois_per_image=32, compute_dtype=jnp.float32)
params = to_jnp(dana.init_params(config, seed=0))
trainable = optim.trainable_mask(params)
state = te.create_train_state(params, 2e-3)

def loss(params, ep, rng):
    # cut backward at frozen leaves (engine/train.py pattern)
    params = jax.tree.map(
        lambda p, t: p if t else jax.lax.stop_gradient(p),
        params, trainable)
    return te.loss_fn(params, config, ep, rng)

@jax.jit
def epoch(state, rng):
    def body(st, ep):
        key = jax.random.fold_in(rng, st.step)
        (l, m), g = jax.value_and_grad(loss, has_aux=True)(st.params, ep, key)
        g = optim.clip_gradients(g, 10.0, trainable=trainable)
        p2, o2 = optim.sgd_update(st.params, g, st.opt, trainable=trainable)
        return te.TrainState(p2, o2, st.step+1), m['loss']
    st, losses = jax.lax.scan(body, state, batch)
    return st, losses.mean()

rng = jax.random.PRNGKey(0)
t0 = time.time()
for ep_i in range(25):
    state, ml = epoch(state, jax.random.fold_in(rng, ep_i))
    if ep_i % 5 == 0 or ep_i == 24:
        print(f'epoch {ep_i} (step {int(state.step)}): loss {float(ml):.4f} [{time.time()-t0:.0f}s]', flush=True)

# eval on the same 4 images
for i in range(4):
    e = eps[i]
    out = dana.forward(state.params, config, jnp.asarray(e['im_data'])[None],
                       jnp.asarray(e['im_info'])[None],
                       jnp.asarray(e['support_ims'][:2])[None], training=False)
    dets, valid = postprocess_batch(out['rois'], out['cls_prob'], out['bbox_pred'],
                                    jnp.asarray(e['im_info'])[None])
    d = np.asarray(dets[0])[np.asarray(valid[0])]
    gt = e['gt_boxes'][e['gt_boxes'][:,4] > 0][:, :4] / e['im_info'][2]
    rois = np.asarray(out['rois'][0])[:, 1:5] / e['im_info'][2]
    pio = np.asarray(iou_matrix(jnp.asarray(rois), jnp.asarray(gt.astype(np.float32)))).max()
    line = f'img {i}: {len(d)} dets, best proposal IoU {pio:.3f}'
    if len(d):
        dio = np.asarray(iou_matrix(jnp.asarray(d[:3,:4].astype(np.float32)), jnp.asarray(gt.astype(np.float32)))).max(axis=1)
        line += f', top det scores {np.round(d[:3,4],3)}, IoUs {np.round(dio,3)}'
    print(line, flush=True)

# Result on TPU v5e (2026-08-16, 400 steps, 4 synthetic images, random init):
#   epoch 24 loss 0.159; per-image best proposal IoU 0.86-0.93;
#   top detections score ~1.0 with IoU up to 0.93 vs gt.
# Demonstrates the full episodic training machinery (CISA attention, RPN
# targets, sampling, losses, SGD) learns end-to-end; 16 train steps
# execute in ~0.3 s on-device via the lax.scan staging pattern.
