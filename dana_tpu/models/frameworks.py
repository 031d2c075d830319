"""The four sibling detection frameworks: FasterRCNN, FSOD, Meta R-CNN,
FGN — functional TPU re-designs sharing the DAnA skeleton.

Parity sources in /root/reference/lib/model/framework/:
  faster_rcnn.py:17-203  (vanilla detector, optional class-specific bbox)
  fsod.py:19-327         (Attention-RPN + multi-relation head)
  meta.py:19-250         (PRN channel-reweighting head)
  fgn.py:19-259          (global-vector RPN gating + conv cls head)

All episodic variants share the trunk: backbone -> (framework-specific
RPN conditioning) -> RPN -> proposal/anchor targets -> RoIAlign ->
(framework-specific head), the pos+neg support branches and the 1:2:1
hard-mined CE (identical code in all four references).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from dana_tpu.core.anchors import generate_anchors, shifted_anchors
from dana_tpu.models import layers as L
from dana_tpu.models import resnet
from dana_tpu.models import rpn as rpn_lib
from dana_tpu.models.dana import (DanaConfig, _pool_rois,
                                  prep_query_images)
from dana_tpu.models.losses import (hard_mined_pair_ce, masked_cross_entropy,
                                    smooth_l1_loss)


def _torch_default_lin(rng, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    return {'weight': rng.uniform(-bound, bound, (cin, cout)).astype(np.float32),
            'bias': rng.uniform(-bound, bound, (cout,)).astype(np.float32)}


def trunk(params, config: DanaConfig, base_feat, corr_feat, im_info,
          gt_boxes, training, rng, rpn_gt_boxes=None):
    """RPN + targets + pooled rois — the shared middle of every framework
    forward (dana.py:158-190 and identical blocks in the siblings).

    rpn_gt_boxes: optional separate gt for the RPN targets (Meta R-CNN
    trains its RPN on the all-class gt, meta.py:65, while roi sampling
    uses the episode gt).  Returns dict with rois, pooled [B,R,7,7,C],
    and at train time the rpn losses + roi targets/labels."""
    b, fh, fw, _ = corr_feat.shape
    # f32 head island under bf16 compute (config.head_dt — same
    # boundary as dana.rpn_attention/rcnn_head; PERF.md "bf16 compute
    # and AP"): the RPN conv heads and everything downstream of RoI
    # pooling run in head_dt, the conv trunk stays in compute_dtype
    logits, probs_fg, deltas = rpn_lib.rpn_forward(
        corr_feat.astype(config.head_dt), params['RCNN_rpn'],
        config.num_anchors)
    base_anchor = generate_anchors(
        ratios=config.anchor_ratios, scales=np.array(config.anchor_scales))
    anchors = shifted_anchors(fh, fw, config.feat_stride, base_anchor)

    pre_nms = config.train_pre_nms if training else config.test_pre_nms
    post_nms = config.train_post_nms if training else config.test_post_nms
    rois, _, roi_mask = rpn_lib.proposal_layer(
        jax.lax.stop_gradient(probs_fg.astype(jnp.float32)),
        jax.lax.stop_gradient(deltas.astype(jnp.float32)), anchors,
        im_info, pre_nms_top_n=pre_nms, post_nms_top_n=post_nms,
        nms_thresh=config.rpn_nms_thresh, nms_cap=config.nms_cap)

    out = {'roi_mask': roi_mask}
    if training:
        k_anchor, k_roi = jax.random.split(rng)
        rpn_gt = rpn_gt_boxes if rpn_gt_boxes is not None else gt_boxes
        labels, at_targets, at_in_w, at_out_w = rpn_lib.anchor_target(
            anchors, rpn_gt, im_info, k_anchor,
            batch_rois=config.rpn_batchsize,
            fg_fraction=config.rpn_fg_fraction,
            pos_overlap=config.rpn_pos_overlap,
            neg_overlap=config.rpn_neg_overlap)
        out['rpn_loss_cls'] = masked_cross_entropy(
            logits.astype(jnp.float32), labels, labels != -1)
        out['rpn_loss_box'] = smooth_l1_loss(
            deltas.astype(jnp.float32), at_targets, at_in_w[..., None],
            at_out_w[..., None], sigma=3.0)
        (rois, rois_label, rois_target, rois_in_w, rois_out_w) = \
            jax.lax.stop_gradient(rpn_lib.proposal_target(
                rois, gt_boxes, k_roi,
                rois_per_image=config.rois_per_image,
                fg_fraction=config.fg_fraction, fg_thresh=config.fg_thresh,
                bg_thresh_hi=config.bg_thresh_hi,
                bg_thresh_lo=config.bg_thresh_lo,
                bbox_normalize_means=config.bbox_normalize_means,
                bbox_normalize_stds=config.bbox_normalize_stds))
        out.update(rois_label=rois_label, rois_target=rois_target,
                   rois_in_w=rois_in_w, rois_out_w=rois_out_w)
    out['rois'] = rois
    # RoIAlign runs in the trunk dtype; the pooled features cross into
    # the head island here
    out['pooled'] = _pool_rois(config, base_feat,
                               rois.astype(base_feat.dtype),
                               training=training).astype(config.head_dt)
    return out


def _finish_episodic(out, config, head_fn, pooled, pos_sup, neg_sup,
                     training):
    """Run the head on pos (and at train, neg) supports; attach the shared
    smooth-L1 + hard-mined CE losses (dana.py:193-215 pattern).  Support-
    side head inputs cross into the f32 head island here (pooled already
    arrives in head_dt from trunk)."""
    hdt = config.head_dt
    bbox_pred, cls_prob, cls_score = head_fn(pooled, pos_sup.astype(hdt))
    if training:
        _, _, neg_score = head_fn(pooled, neg_sup.astype(hdt))
        out['rcnn_loss_bbox'] = smooth_l1_loss(
            bbox_pred.reshape(-1, 4).astype(jnp.float32),
            out['rois_target'].reshape(-1, 4),
            out['rois_in_w'].reshape(-1, 4),
            out['rois_out_w'].reshape(-1, 4), sigma=1.0, reduce_dims=(1,))
        out['rcnn_loss_cls'] = hard_mined_pair_ce(
            cls_score.astype(jnp.float32), out['rois_label'],
            neg_score.astype(jnp.float32))
        out['neg_cls_score'] = neg_score
    out.update(cls_prob=cls_prob, bbox_pred=bbox_pred, cls_score=cls_score)
    return out


def _backbone_supports(params, config, support_ims, training):
    """supports -> per-shot base feats [B, n, 20, 20, 1024]."""
    b, n = support_ims.shape[:2]
    assert support_ims.shape[2] >= 224 and support_ims.shape[3] >= 224, \
        'support images must be >= 224px (AvgPool2d(14) contract)'
    flat = support_ims.reshape(b * n, *support_ims.shape[2:]).astype(
        config.compute_dtype)
    feats = resnet.base_forward(flat, params['backbone'], config.arch)
    return feats.reshape(b, n, *feats.shape[1:])


def _head_to_tail(params, config, pooled):
    """layer4 + global mean: [B, R, 7, 7, 1024] -> [B, R, 2048]."""
    b, r = pooled.shape[:2]
    t = resnet.top_forward(pooled.reshape(b * r, *pooled.shape[2:]),
                           params['backbone'], config.arch)
    return t.mean(axis=(1, 2)).reshape(b, r, -1)


# ===========================================================================
# FSOD (Attention-RPN + multi-relation head)
# ===========================================================================

def init_fsod_params(config: DanaConfig, seed=0, backbone_params=None):
    rng = np.random.default_rng(seed)
    d = 1024

    def lin(cin, cout, std=0.01):
        return L.init_linear(rng, cin, cout, std=std)

    return {
        'backbone': backbone_params if backbone_params is not None
        else resnet.init_params(config.arch, seed=seed),
        'RCNN_rpn': rpn_lib.init_rpn_params(rng, d, config.num_anchors),
        'global_fc_1': lin(2 * d, d), 'global_fc_2': lin(d, d),
        'global_cls_score': lin(d, 2),
        'corr_conv': {'weight': rng.normal(0, 0.01, (1, 1, d, d))
                      .astype(np.float32)},
        'corr_cls_score': lin(d, 2),
        'patch_conv_1': {'weight': rng.normal(0, 0.01, (1, 1, 2 * d, d // 4))
                         .astype(np.float32)},
        'patch_conv_2': {'weight': rng.normal(0, 0.01, (3, 3, d // 4, d // 4))
                         .astype(np.float32)},
        'patch_conv_3': {'weight': rng.normal(0, 0.01, (1, 1, d // 4, d))
                         .astype(np.float32)},
        'patch_cls_score': lin(d, 2),
        'RCNN_bbox_pred': lin(2048, 4, std=0.001),
    }


def fsod_forward(params, config: DanaConfig, im_data, im_info, support_ims,
                 training=False, gt_boxes=None, rng=None):
    """FSOD forward (fsod.py:79-185): shot-averaged support kernels,
    depthwise query-support correlation heatmap before the RPN (VALID
    conv shrinks the RPN grid by 6, as in F.conv2d groups=1024), and the
    three-relation head summed / soft_gamma=10."""
    cdt = config.compute_dtype
    base_feat = resnet.base_forward(
        prep_query_images(config, im_data).astype(cdt), params['backbone'],
                                    config.arch)
    sup = _backbone_supports(params, config, support_ims, training)
    pos = sup[:, :config.n_shot].mean(axis=1)          # [B, 20, 20, 1024]
    pos_pooled = L.avg_pool(pos, window=14, stride=1)  # [B, 7, 7, 1024]
    if training:
        neg = sup[:, config.n_shot:config.n_way * config.n_shot].mean(axis=1)
        neg_pooled = L.avg_pool(neg, window=14, stride=1)

    # attention RPN: depthwise corr of base feat with per-image kernel.
    # grouped conv with per-sample kernels via vmap (fsod.py:107-113)
    def corr_one(feat, kernel):
        return jax.lax.conv_general_dilated(
            feat[None], kernel, window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=feat.shape[-1])[0]
    kernels = pos_pooled[:, :, :, None, :]             # [B, 7, 7, 1, 1024]
    corr = jax.vmap(corr_one)(base_feat, kernels)      # [B, h-6, w-6, 1024]

    out = trunk(params, config, base_feat, corr, im_info, gt_boxes,
                training, rng)

    def head(pooled, sup_pooled):
        bbox_pred = L.linear(_head_to_tail(params, config, pooled),
                             params['RCNN_bbox_pred'])
        b, r = pooled.shape[:2]
        s = sup_pooled[:, None]                        # [B, 1, 7, 7, c]
        s_b = jnp.broadcast_to(s, (b, r, *s.shape[2:]))
        # global relation: concat -> avgpool7 -> fc relu fc relu -> score
        cat = jnp.concatenate([pooled, s_b], axis=-1)  # [B,R,7,7,2c]
        g = cat.mean(axis=(2, 3))
        g = L.relu(L.linear(g, params['global_fc_1']))
        g = L.relu(L.linear(g, params['global_fc_2']))
        g_score = L.linear(g, params['global_cls_score'])
        # local correlation: 1x1 conv both, depthwise 7x7 corr -> [B,R,c]
        cr = L.conv2d(pooled.reshape(b * r, *pooled.shape[2:]),
                      params['corr_conv'], padding='VALID')
        cs = L.conv2d(sup_pooled, params['corr_conv'], padding='VALID')
        cr = cr.reshape(b, r, *cr.shape[1:])
        corr_vec = jnp.einsum('brhwc,bhwc->brc', cr, cs)
        l_score = L.linear(corr_vec, params['corr_cls_score'])
        # patch relation: conv stack on concat
        x = cat.reshape(b * r, *cat.shape[2:])
        x = L.relu(L.conv2d(x, params['patch_conv_1'], padding='VALID'))
        x = L.avg_pool(x, window=3, stride=1)
        x = L.relu(L.conv2d(x, params['patch_conv_2'], padding='VALID'))
        x = L.relu(L.conv2d(x, params['patch_conv_3'], padding='VALID'))
        x = L.avg_pool(x, window=3, stride=1)
        p_score = L.linear(x.reshape(b, r, -1), params['patch_cls_score'])
        score = (g_score + l_score + p_score) / 10.0   # soft_gamma
        return bbox_pred, jax.nn.softmax(score, -1), score

    out = _finish_episodic(out, config, head, out['pooled'], pos_pooled,
                           neg_pooled if training else None, training)
    out['rois_label'] = out.get('rois_label')
    return out


# ===========================================================================
# Meta R-CNN (PRN channel reweighting)
# ===========================================================================

def init_meta_params(config: DanaConfig, seed=0, backbone_params=None):
    rng = np.random.default_rng(seed)
    return {
        'backbone': backbone_params if backbone_params is not None
        else resnet.init_params(config.arch, seed=seed),
        'RCNN_rpn': rpn_lib.init_rpn_params(rng, 1024, config.num_anchors),
        'RCNN_cls_score': {'0': _torch_default_lin(rng, 2048, 2)},
        'RCNN_bbox_pred': L.init_linear(rng, 2048, 4, std=0.001),
    }


def meta_forward(params, config: DanaConfig, im_data, im_info, support_ims,
                 training=False, gt_boxes=None, all_cls_gt_boxes=None,
                 rng=None):
    """Meta R-CNN (meta.py:39-143): PRN sigmoid attention vectors from
    supports, plain RPN on base features using the *all-class* gt
    (meta.py:65), channel-reweighted 2048-d RoI features."""
    cdt = config.compute_dtype
    base_feat = resnet.base_forward(
        prep_query_images(config, im_data).astype(cdt), params['backbone'],
                                    config.arch)

    def prn(sup_flat):
        f = resnet.base_forward(sup_flat, params['backbone'], config.arch)
        f = L.max_pool(f, window=2, stride=2)
        f = resnet.top_forward(f, params['backbone'], config.arch)
        return jax.nn.sigmoid(f.mean(axis=(1, 2)))     # [n, 2048]

    b, n = support_ims.shape[:2]
    vecs = prn(support_ims.reshape(b * n, *support_ims.shape[2:])
               .astype(cdt)).reshape(b, n, -1)
    pos_vec = vecs[:, :config.n_shot].mean(axis=1)     # [B, 2048]
    neg_vec = vecs[:, config.n_shot:config.n_way * config.n_shot].mean(axis=1) \
        if training else None

    out = trunk(params, config, base_feat, base_feat, im_info, gt_boxes,
                training, rng, rpn_gt_boxes=all_cls_gt_boxes)

    tail = _head_to_tail(params, config, out['pooled'])  # [B, R, 2048]

    def head(tail_feat, vec):
        bbox_pred = L.linear(tail_feat, params['RCNN_bbox_pred'])
        combined = tail_feat * vec[:, None, :]
        score = L.linear(combined, params['RCNN_cls_score']['0'])
        return bbox_pred, jax.nn.softmax(score, -1), score

    out = _finish_episodic(out, config, head, tail, pos_vec, neg_vec,
                           training)
    return out


# ===========================================================================
# FGN (support-vector gated RPN + conv cls head)
# ===========================================================================

def init_fgn_params(config: DanaConfig, seed=0, backbone_params=None):
    rng = np.random.default_rng(seed)
    return {
        'backbone': backbone_params if backbone_params is not None
        else resnet.init_params(config.arch, seed=seed),
        'RCNN_rpn': rpn_lib.init_rpn_params(rng, 1024, config.num_anchors),
        'cls_conv1': {'weight': rng.normal(0, 0.01, (3, 3, 2048, 512))
                      .astype(np.float32)},
        'bn1': L.init_bn(512),
        'cls_conv2': {'weight': rng.normal(0, 0.01, (3, 3, 512, 128))
                      .astype(np.float32)},
        'bn2': L.init_bn(128),
        'RCNN_cls_score': _torch_default_lin(rng, 128 * 3 * 3, 2),
        'RCNN_bbox_pred': L.init_linear(rng, 2048, 4, std=0.001),
    }


def fgn_forward(params, config: DanaConfig, im_data, im_info, support_ims,
                training=False, gt_boxes=None, rng=None):
    """FGN (fgn.py:50-165): global support vector (AvgPool 20) gates the
    base features before the RPN; cls head = conv/bn stack on the concat
    of pooled support and roi features.  With config.bn_train
    (cfg.TRAIN.BN_TRAIN) the head BNs normalize with batch stats at train
    time and emit running-stat updates in out['param_updates'] (the
    reference's bn1/bn2 are ordinary train-mode nn.BatchNorm2d,
    fgn.py:145-165); otherwise stored-stats inference mode."""
    cdt = config.compute_dtype
    base_feat = resnet.base_forward(
        prep_query_images(config, im_data).astype(cdt), params['backbone'],
                                    config.arch)
    sup = _backbone_supports(params, config, support_ims, training)
    pos = sup[:, :config.n_shot].mean(axis=1)              # [B, 20, 20, c]
    pos_rpn = pos.mean(axis=(1, 2), keepdims=True)         # AvgPool2d(20)
    pos_rcnn = L.avg_pool(pos, window=14, stride=1)        # [B, 7, 7, c]
    if training:
        neg = sup[:, config.n_shot:config.n_way * config.n_shot].mean(axis=1)
        neg_rcnn = L.avg_pool(neg, window=14, stride=1)

    gated = base_feat * pos_rpn                            # [B, h, w, c]
    out = trunk(params, config, base_feat, gated, im_info, gt_boxes,
                training, rng)

    bn_train = training and config.bn_train
    # sequential running-stat state across the pos + neg head calls
    # (torch updates the same buffers twice per step)
    bn_state = {'bn1': dict(params['bn1']), 'bn2': dict(params['bn2'])}

    def bn(x, name):
        if bn_train:
            y, new_stats = L.batchnorm_train(x, bn_state[name])
            bn_state[name].update(new_stats)
            return y
        return L.frozen_batchnorm(x, params[name])

    def head(pooled, sup_pooled):
        bbox_pred = L.linear(_head_to_tail(params, config, pooled),
                             params['RCNN_bbox_pred'])
        b, r = pooled.shape[:2]
        s_b = jnp.broadcast_to(sup_pooled[:, None],
                               (b, r, *sup_pooled.shape[1:]))
        x = jnp.concatenate([s_b, pooled], axis=-1)        # [B,R,7,7,2048]
        x = x.reshape(b * r, *x.shape[2:])
        x = L.relu(bn(L.conv2d(x, params['cls_conv1'], padding='VALID'),
                      'bn1'))
        x = L.relu(bn(L.conv2d(x, params['cls_conv2'], padding='VALID'),
                      'bn2'))
        score = L.linear(x.reshape(b, r, -1), params['RCNN_cls_score'])
        return bbox_pred, jax.nn.softmax(score, -1), score

    out = _finish_episodic(out, config, head, out['pooled'], pos_rcnn,
                           neg_rcnn if training else None, training)
    if bn_train:
        out['param_updates'] = {
            name: {k: bn_state[name][k]
                   for k in ('running_mean', 'running_var')}
            for name in ('bn1', 'bn2')}
    return out


# ===========================================================================
# Vanilla Faster R-CNN
# ===========================================================================

def init_frcnn_params(config: DanaConfig, num_classes=2, seed=0,
                      backbone_params=None, class_agnostic=False):
    rng = np.random.default_rng(seed)
    nb = 4 if class_agnostic else 4 * num_classes
    return {
        'backbone': backbone_params if backbone_params is not None
        else resnet.init_params(config.arch, seed=seed),
        'RCNN_rpn': rpn_lib.init_rpn_params(rng, 1024, config.num_anchors),
        'RCNN_cls_score': L.init_linear(rng, 2048, num_classes, std=0.01),
        'RCNN_bbox_pred': L.init_linear(rng, 2048, nb, std=0.001),
    }


def frcnn_forward(params, config: DanaConfig, im_data, im_info,
                  training=False, gt_boxes=None, rng=None,
                  class_agnostic=False):
    """Vanilla Faster R-CNN (faster_rcnn.py:35-102): no supports;
    multi-class CE + class-selected bbox deltas at train."""
    cdt = config.compute_dtype
    base_feat = resnet.base_forward(
        prep_query_images(config, im_data).astype(cdt), params['backbone'],
                                    config.arch)
    out = trunk(params, config, base_feat, base_feat, im_info, gt_boxes,
                training, rng)
    tail = _head_to_tail(params, config, out['pooled'])
    bbox_pred = L.linear(tail, params['RCNN_bbox_pred'])
    cls_score = L.linear(tail, params['RCNN_cls_score'])
    cls_prob = jax.nn.softmax(cls_score, -1)
    if training:
        labels = out['rois_label']
        if not class_agnostic:
            b, r = labels.shape
            view = bbox_pred.reshape(b, r, -1, 4)
            bbox_pred = jnp.take_along_axis(
                view, labels[..., None, None].astype(jnp.int32), axis=2
            )[..., 0, :]
        logp = jax.nn.log_softmax(cls_score.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        out['rcnn_loss_cls'] = nll.mean()
        out['rcnn_loss_bbox'] = smooth_l1_loss(
            bbox_pred.reshape(-1, 4).astype(jnp.float32),
            out['rois_target'].reshape(-1, 4),
            out['rois_in_w'].reshape(-1, 4),
            out['rois_out_w'].reshape(-1, 4), sigma=1.0, reduce_dims=(1,))
    out.update(cls_prob=cls_prob, bbox_pred=bbox_pred, cls_score=cls_score)
    return out


# ===========================================================================
# factory
# ===========================================================================

_FORWARDS = {'fsod': fsod_forward, 'meta': meta_forward, 'fgn': fgn_forward,
             'frcnn': frcnn_forward}
_INITS = {'fsod': init_fsod_params, 'meta': init_meta_params,
          'fgn': init_fgn_params, 'frcnn': init_frcnn_params}


def get_model(name, common_cfg: dict, seed=0):
    """-> (config, params); `forward_fn(name)` gives the matching forward."""
    config = DanaConfig(**common_cfg)
    return config, _INITS[name](config, seed=seed)


def forward_fn(name):
    return _FORWARDS[name]
