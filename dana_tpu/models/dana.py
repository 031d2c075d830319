"""DAnA (Dual-Awareness Attention) few-shot detector, TPU-native.

Functional re-design of the reference _DAnARCNN
(/root/reference/lib/model/framework/dana.py:19-388).  The per-shot Python
loops over bmm/softmax (dana.py:123-151, 260-280) become batched einsums
over a shot axis; the per-image chunk loop of rcnn_head (dana.py:250-259)
disappears because everything stays [B, R, ...] batched.  Param-tree key
names mirror the torch module names 1:1 (rpn_adapt_q_layer,
output_score_layer.linear1, ...) so the released `cisa_coco_ft30`
checkpoint converts mechanically.

Shapes follow the reference: supports are [B, n_images, 320, 320, 3]
(NHWC), base features stride 16 -> support tokens 20x20=400; RoI tokens
7x7=49.  All attention shapes are static; masks carry validity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dana_tpu.core.anchors import generate_anchors, shifted_anchors
from dana_tpu.models import layers as L
from dana_tpu.models import resnet
from dana_tpu.models import rpn as rpn_lib
from dana_tpu.models.losses import (hard_mined_pair_ce, masked_cross_entropy,
                                    smooth_l1_loss)
from dana_tpu.ops.roi_align import roi_align
from dana_tpu.ops.roi_pool import roi_pool


@dataclasses.dataclass(frozen=True)
class DanaConfig:
    """Static model/trace configuration (hashable: usable as a jit static
    arg).  Field names/defaults follow DAnARCNN.__init__ (dana.py:328-334)
    and the global cfg keys it reads."""
    n_way: int = 2
    n_shot: int = 3
    attention_type: str = 'concat'          # 'concat' | 'product'
    rpn_reduce_dim: int = 256
    rcnn_reduce_dim: int = 256
    gamma: float = 0.1                      # channel_gamma (BA block)
    unary_gamma: float = 0.1
    semantic_enhance: bool = False          # use_BA_block
    pos_encoding: bool = True
    arch: str = 'resnet50'
    pooling_size: int = 7
    pooling_mode: str = 'align'             # 'align' | 'pool'
    anchor_scales: tuple = (4, 8, 16, 32)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    feat_stride: int = 16
    # proposal layer (cfg.TRAIN/.TEST blocks)
    train_pre_nms: int = 12000
    train_post_nms: int = 2000
    test_pre_nms: int = 6000
    test_post_nms: int = 300
    rpn_nms_thresh: float = 0.7
    # Pre-NMS candidate cap for the fixed-shape tiled NMS.  12000 honors
    # the reference's full TRAIN.RPN_PRE_NMS_TOP_N (proposal_layer.py:
    # 135-190); a 6000 cap measured -0.25 proposal recall@0.5 when it
    # binds (tools/nms_cap_study.py, PERF.md r3).  TEST pre-NMS is 6000,
    # so eval never reaches the cap.
    nms_cap: int = 12000
    # int8 MXU path for the RoIAlign combined matmul at inference
    # (cfg.TPU.QUANT_INT8 serving mode; ops/roi_align.py int8=)
    roi_align_int8: bool = False
    # BGR Caffe pixel means (cfg.PIXEL_MEANS, config.py:258) — used only
    # when im_data arrives as uint8 raw pixels (TPU.SHIP_UINT8: the host
    # ships 4x less over the wire and the mean-sub runs on device, fused
    # into the stem)
    pixel_means: tuple = (102.9801, 115.9465, 122.7717)
    # target layers
    rpn_batchsize: int = 256
    rpn_fg_fraction: float = 0.5
    rpn_pos_overlap: float = 0.7
    rpn_neg_overlap: float = 0.3
    rois_per_image: int = 128
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.1
    bbox_normalize_means: tuple = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: tuple = (0.1, 0.1, 0.2, 0.2)
    compute_dtype: Any = jnp.float32
    # Per-stage precision islands (None -> compute_dtype).  bf16 compute
    # on an f32-trained checkpoint costs AP through the precision-
    # sensitive stages while the conv trunk tolerates bf16 (PERF.md
    # "bf16 compute and AP"): attention_dtype covers both CISA blocks
    # (projections + softmax core), head_dtype covers the RPN conv heads
    # and the whole R-CNN head (RoI tail, bbox/cls layers).
    attention_dtype: Any = None
    head_dtype: Any = None
    # FGN head BNs in batch-stats mode at train time (cfg.TRAIN.BN_TRAIN;
    # reference fgn.py head bn1/bn2 are ordinary nn.BatchNorm2d that train)
    bn_train: bool = False
    # fused Pallas CISA attention core (auto-disabled off-TPU)
    use_pallas_attention: bool = True
    # rematerialize backbone activations in the backward pass (trade
    # FLOPs for HBM; enables larger episodic batches per chip)
    remat_backbone: bool = False

    @property
    def attention_dt(self):
        return (self.compute_dtype if self.attention_dtype is None
                else self.attention_dtype)

    @property
    def head_dt(self):
        return (self.compute_dtype if self.head_dtype is None
                else self.head_dtype)

    @property
    def num_anchors(self):
        return len(self.anchor_scales) * len(self.anchor_ratios)

    @property
    def feat_dim(self):
        """Base-feature channels: 512 for VGG16, 1024 for ResNets."""
        return 512 if self.arch == 'vgg16' else 1024

    @property
    def tail_dim(self):
        """RoI-tail feature dim: fc7 4096 for VGG16, layer4 2048 else."""
        return 4096 if self.arch == 'vgg16' else 2048

    @property
    def rpn_din(self):
        return 2 * self.feat_dim if self.attention_type == 'concat' \
            else self.feat_dim


def positional_encoding(length: int, d_model: int = 1024) -> np.ndarray:
    """Sinusoidal PE table (dana.py PositionalEncoding:338-353)."""
    pe = np.zeros((length, d_model), np.float32)
    position = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def init_params(config: DanaConfig, seed: int = 0,
                backbone_params=None) -> dict:
    """Random-init the full DAnA param tree (init conventions of
    dana.py:44-69 & _init_weights:222-238: normal std 0.01, bbox_pred
    std 0.001, zero biases; FFN linears use torch Linear default
    kaiming-uniform — approximated with the same uniform bound)."""
    rng = np.random.default_rng(seed)
    d = config.feat_dim

    def lin(cin, cout, std=0.01):
        return L.init_linear(rng, cin, cout, std=std)

    def torch_default_lin(cin, cout):
        bound = 1.0 / math.sqrt(cin)
        return {'weight': rng.uniform(-bound, bound, (cin, cout)).astype(np.float32),
                'bias': rng.uniform(-bound, bound, (cout,)).astype(np.float32)}

    if backbone_params is None:
        if config.arch == 'vgg16':
            from dana_tpu.models import vgg
            backbone_params = vgg.init_params(seed=seed)
        else:
            backbone_params = resnet.init_params(config.arch, seed=seed)
    p = {
        'backbone': backbone_params,
        'rpn_unary_layer': lin(d, 1),
        'rcnn_unary_layer': lin(d, 1),
        'rpn_adapt_q_layer': lin(d, config.rpn_reduce_dim),
        'rpn_adapt_k_layer': lin(d, config.rpn_reduce_dim),
        'rcnn_adapt_q_layer': lin(d, config.rcnn_reduce_dim),
        'rcnn_adapt_k_layer': lin(d, config.rcnn_reduce_dim),
        'RCNN_rpn': rpn_lib.init_rpn_params(rng, config.rpn_din,
                                            config.num_anchors),
        'rcnn_transform_layer': torch_default_lin(config.rpn_din, 64),
        'output_score_layer': {
            'linear1': torch_default_lin(64 * config.pooling_size ** 2,
                                         1024),
            'linear2': torch_default_lin(1024, 2),
        },
        'RCNN_bbox_pred': lin(config.tail_dim, 4, std=0.001),
    }
    if config.semantic_enhance:
        p['rpn_channel_k_layer'] = lin(d, 1)
    return p


def backbone_base(params, config: DanaConfig, x):
    """Stride-16 base features for any supported arch."""
    def run(p, xx):
        if config.arch == 'vgg16':
            from dana_tpu.models import vgg
            return vgg.base_forward(xx, p['backbone'])
        return resnet.base_forward(xx, p['backbone'], config.arch)
    if config.remat_backbone:
        run = jax.checkpoint(run)
    return run(params, x)


def backbone_tail(params, config: DanaConfig, pooled_flat):
    """RoI tail: [N, P, P, C] -> [N, tail_dim] (layer4+mean or fc6/fc7)."""
    if config.arch == 'vgg16':
        from dana_tpu.models import vgg
        return vgg.tail_forward(pooled_flat, params['backbone'])
    t = resnet.top_forward(pooled_flat, params['backbone'], config.arch)
    return t.mean(axis=(1, 2))


def _cisa_attention(q_tokens, s_tokens, params, prefix, reduce_dim,
                    unary_gamma, se_params=None, gamma=0.1,
                    use_fused=True):
    """CISA block: query-conditioned support aggregation (dana.py:120-151).

    Args:
      q_tokens: [B, (R,) Nq, C] query tokens (PE already applied if used);
        the optional R axis carries per-RoI token groups (rcnn path) —
        q centering is per group over its Nq tokens, matching the
        reference's per-RoI `q_matrix.mean(1)` (dana.py:267).
      s_tokens: [B, shot, Ns, C] support tokens (PE applied) — NOT
        broadcast per RoI: k/unary projections happen once per
        (batch, shot) (the reference repeats the support per RoI,
        dana.py:255, but projects the identical values; computing them
        once is numerically the same and ~R x cheaper).
      prefix: 'rpn' | 'rcnn' selects the q/k/unary param names.
    Returns [B, (R,) Nq, C]: attended support feature, mean over shots.

    On TPU the softmax(qk^T)+unary @ v core with the in-kernel shot mean
    runs as a fused Pallas kernel (ops/cisa_attention.py); the
    projections stay XLA matmuls.
    """
    if se_params is not None:
        # BA block (semantic_enhance, dana.py:133-137): spatial softmax ->
        # global channel vector -> leaky_relu residual
        w = L.linear(s_tokens, se_params)                       # [B,shot,Ns,1]
        w = jax.nn.softmax(w, axis=-2)
        glob = jnp.sum(w * s_tokens, axis=-2, keepdims=True)    # [B,shot,1,C]
        s_tokens = s_tokens + gamma * L.leaky_relu(glob)

    q = L.linear(q_tokens, params[f'{prefix}_adapt_q_layer'])
    q = q - q.mean(axis=-2, keepdims=True)                      # center over Nq
    k = L.linear(s_tokens, params[f'{prefix}_adapt_k_layer'])
    k = k - k.mean(axis=-2, keepdims=True)                      # center over Ns

    unary = L.linear(s_tokens, params[f'{prefix}_unary_layer'])  # [B,shot,Ns,1]
    unary_sm = jax.nn.softmax(unary, axis=-2)[..., 0]            # [B,shot,Ns]
    scale = 1.0 / math.sqrt(reduce_dim)

    b, d = q.shape[0], q.shape[-1]
    extra, nq = q.shape[1:-2], q.shape[-2]
    c = s_tokens.shape[-1]
    qf = q.reshape(b, -1, d)          # [B, prod(extra)*Nq, D]

    from dana_tpu.ops import cisa_attention as fused
    if use_fused and fused.supports_pallas():
        out = fused.cisa_attention_shots(qf, k, s_tokens, unary_sm,
                                         scale, unary_gamma)
    else:
        out = fused.cisa_attention_shots_xla(qf, k, s_tokens, unary_sm,
                                             scale, unary_gamma)
    return out.reshape(b, *extra, nq, c)


def _support_tokens(feat, pe_table):
    """[B, shot, h, w, C] -> [B, shot, h*w, C] (+PE)."""
    b, s, h, w, c = feat.shape
    tokens = feat.reshape(b, s, h * w, c)
    if pe_table is not None:
        tokens = tokens + pe_table[:h * w]
    return tokens


def rcnn_head(params, config: DanaConfig, pooled_feat, support_pooled,
              pe_table):
    """Per-RoI classification head + bbox regression (dana.py:244-306).

    pooled_feat: [B, R, 7, 7, 1024]; support_pooled: [B, shot, 7, 7, 1024].
    Returns (bbox_pred [B,R,4], cls_prob [B,R,2], cls_score [B,R,2]).
    """
    b, r, ph, pw, c = pooled_feat.shape
    adt, hdt = config.attention_dt, config.head_dt
    pooled_feat = pooled_feat.astype(hdt)
    # bbox branch: tail (layer4+mean / fc6-fc7) -> Linear(tail_dim, 4)
    fc7 = backbone_tail(params, config,
                        pooled_feat.reshape(b * r, ph, pw, c))
    bbox_pred = L.linear(fc7.reshape(b, r, -1), params['RCNN_bbox_pred'])

    q_tokens = pooled_feat.reshape(b, r, ph * pw, c).astype(adt)
    # PE on BOTH roi and support tokens is gated by pos_encoding
    # (reference dana.py:257-259).
    s_tokens = _support_tokens(
        support_pooled.astype(adt),
        pe_table if config.pos_encoding else None)
    if config.pos_encoding:
        q_tokens = q_tokens + pe_table[:ph * pw]
    # rois attend supports: q [B,R,49,1024], s [B,shot,49,1024].  The
    # support side is NOT broadcast per RoI (the reference's repeat at
    # dana.py:255 projects identical values R times); _cisa_attention
    # projects k/unary once per (batch, shot) and the fused kernel
    # shares them across all R*49 query rows.
    q = q_tokens
    dense = _cisa_attention(q, s_tokens, params, 'rcnn',
                            config.rcnn_reduce_dim, config.unary_gamma,
                            use_fused=config.use_pallas_attention)
    tw = params['rcnn_transform_layer']
    q, dense = q.astype(hdt), dense.astype(hdt)
    if config.attention_type == 'concat':
        # concat([q, dense]) @ W == q @ W[:C] + dense @ W[C:]: splitting
        # the weight skips materializing the [B, R, 49, 2C] concat
        # (~480 MB at eval shapes) — identical math, same param layout.
        w = tw['weight'].astype(hdt)
        corr = (jnp.einsum('brqc,cd->brqd', q, w[:c])
                + jnp.einsum('brqc,cd->brqd', dense, w[c:])
                + tw['bias'].astype(hdt))                      # [B,R,49,64]
    else:
        corr = L.linear(q * dense, tw)
    x = corr.reshape(b, r, -1)
    x = L.relu(L.linear(x, params['output_score_layer']['linear1']))
    cls_score = L.linear(x, params['output_score_layer']['linear2'])
    cls_prob = jax.nn.softmax(cls_score, axis=-1)
    return bbox_pred, cls_prob, cls_score


def extract_support_feats(params, config: DanaConfig, support_ims):
    """Backbone + pooling on supports.

    support_ims: [B, n, 320, 320, 3] (or host-packed space-to-depth
    [B, n, 163, 163, 12], blob.s2d_pack) -> (tokens feat
    [B, n, 20, 20, 1024], pooled [B, n, 7, 7, 1024])
    (dana.py:100-108: AvgPool2d(14, stride=1))."""
    b, n, sh, sw, c = support_ims.shape
    eff_h, eff_w = ((sh - 3) * 2, (sw - 3) * 2) if c == 12 else (sh, sw)
    assert eff_h >= 224 and eff_w >= 224, (
        f'support images must be >= 224px (got {eff_h}x{eff_w}): the fixed '
        f'AvgPool2d(14) of dana.py:105 needs a >= 14x14 feature map')
    flat = support_ims.reshape(b * n, sh, sw, c).astype(config.compute_dtype)
    feats = backbone_base(params, config, flat)
    pooled = L.avg_pool(feats, window=14, stride=1)
    fh, fw, c = feats.shape[1:]
    return (feats.reshape(b, n, fh, fw, c),
            pooled.reshape(b, n, *pooled.shape[1:]))


def rpn_attention(params, config: DanaConfig, base_feat, support_feat,
                  rpn_pe_table):
    """CISA on the RPN path: query feature map attends support tokens
    (dana.py:118-156). base_feat [B,h,w,1024], support_feat
    [B,shot,20,20,1024] -> correlation feat [B,h,w,din]."""
    b, h, w, c = base_feat.shape
    adt, hdt = config.attention_dt, config.head_dt
    q_tokens = base_feat.reshape(b, h * w, c).astype(adt)  # no PE on query
    pe = rpn_pe_table if config.pos_encoding else None
    s_tokens = _support_tokens(support_feat.astype(adt), pe)
    se = params.get('rpn_channel_k_layer') if config.semantic_enhance else None
    dense = _cisa_attention(q_tokens, s_tokens, params, 'rpn',
                            config.rpn_reduce_dim, config.unary_gamma,
                            se, config.gamma,
                            use_fused=config.use_pallas_attention)
    dense = dense.reshape(b, h, w, c)
    if config.attention_type == 'concat':
        return jnp.concatenate([base_feat.astype(hdt), dense.astype(hdt)],
                               axis=-1)
    return base_feat.astype(hdt) * dense.astype(hdt)


def prep_query_images(config: DanaConfig, im_data):
    """Device-side input prep shared by EVERY framework forward (DAnA,
    fsod, meta, fgn, frcnn): raw uint8 pixels shipped host->device
    (TPU.SHIP_UINT8) get the BGR mean subtraction here, fused into the
    stem.  The channel dim is 3 (direct) or 12 (s2d-packed: means tile
    x4).  Float inputs pass through untouched."""
    if im_data.dtype == jnp.uint8:
        reps = im_data.shape[-1] // 3
        means = jnp.tile(jnp.asarray(config.pixel_means, jnp.float32),
                         reps)
        im_data = im_data.astype(jnp.float32) - means
    return im_data


def _pool_rois(config: DanaConfig, base_feat, rois, training=True):
    if config.pooling_mode == 'align':
        # int8 serving path only at inference (round() kills gradients)
        return roi_align(base_feat, rois, config.pooling_size, 1.0 / 16.0,
                         0, int8=config.roi_align_int8 and not training)
    if config.pooling_mode == 'crop':
        from dana_tpu.ops.grid_sample import roi_crop_pool
        return roi_crop_pool(base_feat, rois, config.pooling_size,
                             1.0 / 16.0)
    return roi_pool(base_feat, rois, config.pooling_size, 1.0 / 16.0)


def forward(params, config: DanaConfig, im_data, im_info, support_ims=None,
            training: bool = False, gt_boxes=None, rng=None,
            support_feats=None):
    """Full episodic forward (dana.py:87-220).

    Args:
      im_data: [B, H, W, 3] preprocessed query images (BGR, mean-sub).
      im_info: [B, 3] (height, width, scale).
      support_ims: [B, n_way*n_shot (train) | n_shot (eval), 320, 320, 3].
      gt_boxes: [B, G, 5] padded gt (train only; class col holds 1).
      rng: PRNG key (train only; drives target-layer sampling).
      support_feats: optional precomputed (sup_feat [B,n,20,20,C],
        sup_pooled [B,n,7,7,C]) — at eval the per-class supports are
        fixed (seeded pool, inference_loader), so their backbone pass can
        be hoisted out of the per-batch loop entirely (the reference
        re-encodes supports for every query image, inference.py:100).

    Returns a dict mirroring the reference 8-tuple: rois, cls_prob,
    bbox_pred, rpn_loss_cls, rpn_loss_box, rcnn_loss_cls, rcnn_loss_bbox,
    rois_label (plus neg-branch scores at train for the mined loss).
    """
    cdt = config.compute_dtype
    im_data = prep_query_images(config, im_data)
    base_feat = backbone_base(params, config, im_data.astype(cdt))
    b, fh, fw, _ = base_feat.shape

    if support_feats is not None:
        sup_feat, sup_pooled = support_feats
    else:
        sup_feat, sup_pooled = extract_support_feats(params, config,
                                                     support_ims)
    pos_feat = sup_feat[:, :config.n_shot]
    pos_pooled = sup_pooled[:, :config.n_shot]
    if training:
        # n_way=1 would make neg_pooled [B,0,...]; its shot-mean is NaN and
        # skip_nonfinite then silently no-ops every update. Fail loudly.
        assert config.n_way >= 2, (
            'training requires n_way >= 2 (a negative support way feeds the '
            'hard-mined loss, reference dana.py:189-215); got n_way='
            f'{config.n_way}')
        neg_pooled = sup_pooled[:, config.n_shot:config.n_way * config.n_shot]

    rpn_pe = jnp.asarray(positional_encoding(20 * 20, config.feat_dim),
                         config.attention_dt)
    roi_pe = jnp.asarray(
        positional_encoding(config.pooling_size ** 2, config.feat_dim),
        config.attention_dt)

    corr = rpn_attention(params, config, base_feat, pos_feat, rpn_pe)

    logits, probs_fg, deltas = rpn_lib.rpn_forward(
        corr, params['RCNN_rpn'], config.num_anchors)

    base_anchor = generate_anchors(
        ratios=config.anchor_ratios, scales=np.array(config.anchor_scales))
    anchors = shifted_anchors(fh, fw, config.feat_stride, base_anchor)

    pre_nms = config.train_pre_nms if training else config.test_pre_nms
    post_nms = config.train_post_nms if training else config.test_post_nms
    # proposal selection is non-differentiable in the reference (inputs are
    # .data tensors, _ProposalLayer.backward is a no-op) — cut the gradient
    # so autodiff never traverses NMS/top-k
    rois, roi_scores, roi_mask = rpn_lib.proposal_layer(
        jax.lax.stop_gradient(probs_fg.astype(jnp.float32)),
        jax.lax.stop_gradient(deltas.astype(jnp.float32)), anchors,
        im_info, pre_nms_top_n=pre_nms, post_nms_top_n=post_nms,
        nms_thresh=config.rpn_nms_thresh, nms_cap=config.nms_cap)

    out = {}
    rois_label = None
    if training:
        k_anchor, k_roi = jax.random.split(rng)
        labels, at_targets, at_in_w, at_out_w = rpn_lib.anchor_target(
            anchors, gt_boxes, im_info, k_anchor,
            batch_rois=config.rpn_batchsize,
            fg_fraction=config.rpn_fg_fraction,
            pos_overlap=config.rpn_pos_overlap,
            neg_overlap=config.rpn_neg_overlap)
        rpn_loss_cls = masked_cross_entropy(
            logits.astype(jnp.float32), labels, labels != -1)
        rpn_loss_box = smooth_l1_loss(
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
        out.update(rpn_loss_cls=rpn_loss_cls, rpn_loss_box=rpn_loss_box)

    pooled = _pool_rois(config, base_feat, rois.astype(cdt),
                        training=training)                     # [B,R,7,7,C]

    bbox_pred, cls_prob, cls_score = rcnn_head(
        params, config, pooled, pos_pooled, roi_pe)

    if training:
        neg_bbox, neg_prob, neg_score = rcnn_head(
            params, config, pooled, neg_pooled, roi_pe)
        # flattened over all rois of all images, like the reference's
        # _smooth_l1_loss default dim=[1] on [B*R, 4] (dana.py:201)
        rcnn_loss_bbox = smooth_l1_loss(
            bbox_pred.reshape(-1, 4).astype(jnp.float32),
            rois_target.reshape(-1, 4), rois_in_w.reshape(-1, 4),
            rois_out_w.reshape(-1, 4), sigma=1.0, reduce_dims=(1,))
        rcnn_loss_cls = hard_mined_pair_ce(
            cls_score.astype(jnp.float32), rois_label,
            neg_score.astype(jnp.float32))
        out.update(rcnn_loss_cls=rcnn_loss_cls, rcnn_loss_bbox=rcnn_loss_bbox,
                   neg_cls_score=neg_score)

    out.update(rois=rois, cls_prob=cls_prob, bbox_pred=bbox_pred,
               cls_score=cls_score, rois_label=rois_label,
               roi_mask=None if training else roi_mask)
    return out
