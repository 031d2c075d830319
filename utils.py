"""Shared CLI utilities: argument parsing, model factory, single-image
detection path.

Parity: /root/reference/utils.py:24-317 — same flag surface
(--net/--dataset/--way/--shot/--bs/--flip/--r/--checkepoch/...), the
--ascale anchor presets (utils.py:68-73), the dataset-name -> imdb-name
mapping (:74-104), and the model factory (:108-127; the reference's
`cisa` branch references an undefined CISARCNN — here `cisa` is DAnA
with use_BA_block=False, which is what the released cisa checkpoint is).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description='Train a DAnA network')
    parser.add_argument('--dataset', default='pascal_voc', type=str)
    parser.add_argument('--net', default='DAnA', type=str,
                        help='model: DAnA, cisa, frcnn, fsod, meta, fgn '
                             '(reference semantics, utils.py:108-127); '
                             'a backbone name (res50/res101/vgg16) selects '
                             'DAnA on that backbone')
    parser.add_argument('--backbone', default='res50', type=str,
                        help='res50, res101, vgg16 (reference hardcodes '
                             'res50, dana.py:337)')
    parser.add_argument('--flip', dest='use_flip', action='store_true',
                        default=False)
    parser.add_argument('--o', dest='optimizer', default='sgd', type=str)
    parser.add_argument('--lr', default=0.001, type=float)
    parser.add_argument('--lr_decay_step', default=1000, type=int)
    parser.add_argument('--lr_decay_gamma', default=0.1, type=float)
    parser.add_argument('--nw', dest='num_workers', default=8, type=int)
    parser.add_argument('--ls', dest='large_scale', action='store_true')
    parser.add_argument('--mGPUs', dest='mGPUs', action='store_true',
                        help='data-parallel over all local devices')
    parser.add_argument('--tp', dest='tp', default=0, type=int,
                        help='tensor-parallel degree (inference: shards '
                             'the wide projection weights over a '
                             '(data, model) mesh for latency-mode '
                             'serving; combines with --mGPUs)')
    parser.add_argument('--sp', dest='sp', default=0, type=int,
                        help='spatial-partition degree (inference: '
                             'shards each query image\'s H axis over a '
                             '(data, model) mesh — GSPMD inserts conv '
                             'halo exchanges; mutually exclusive with '
                             '--tp, combines with --mGPUs)')
    parser.add_argument('--slices', dest='slices', default=0, type=int,
                        help='multi-slice data parallelism (train: '
                             'shards the batch over a two-level '
                             '(slice, data) mesh — cross-slice gradient '
                             'all-reduce rides DCN, intra-slice ICI; '
                             'implies --mGPUs semantics)')
    parser.add_argument('--bs', dest='batch_size', default=16, type=int)
    parser.add_argument('--start_epoch', default=1, type=int)
    parser.add_argument('--epochs', dest='max_epochs', default=12, type=int)
    parser.add_argument('--disp_interval', default=100, type=int)
    parser.add_argument('--save_dir', default='models', type=str)
    parser.add_argument('--ascale', default=4, type=int)
    parser.add_argument('--eval', dest='eval', action='store_true',
                        default=False)
    parser.add_argument('--onc', dest='old_n_classes', default=81, type=int)
    parser.add_argument('--eval_dir', default=None, type=str)
    parser.add_argument('--fs', dest='fewshot', action='store_true',
                        default=False)
    parser.add_argument('--way', default=1, type=int)
    parser.add_argument('--shot', default=5, type=int)
    parser.add_argument('--sup_dir', default='all', type=str)
    parser.add_argument('--r', dest='resume', action='store_true',
                        default=False)
    parser.add_argument('--load_dir', default='models', type=str)
    parser.add_argument('--checkepoch', default=1, type=int)
    parser.add_argument('--checkpoint', default=0, type=int)
    parser.add_argument('--checkpath', default=None, type=str,
                        help='explicit checkpoint path (.dkpt or .pth)')
    parser.add_argument('--dlog', action='store_true', default=False)
    parser.add_argument('--imlog', action='store_true', default=False)
    parser.add_argument('--seed', default=1996, type=int)
    parser.add_argument('--clip_norm', default=0.0, type=float,
                        help='global grad-norm clip '
                             '(reference clips only for vgg16)')
    parser.add_argument('--steps_per_call', default=1, type=int,
                        help='stage N batches per jitted call (lax.scan); '
                             'amortizes dispatch latency on TPU')
    parser.add_argument('--ckpt_backend', default='pickle', type=str,
                        choices=['pickle', 'orbax'],
                        help='checkpoint writer: single-file pickle or '
                        'Orbax directory (async/sharded-aware)')
    parser.add_argument('--profile', default=None, type=str,
                        help='capture a jax.profiler trace into this dir '
                             '(steps 3-8 of the run)')
    parser.add_argument('--dist', action='store_true', default=False,
                        help='join a multi-process jax.distributed '
                             'runtime (multi-host pod slices; each '
                             'process loads only its batch rows — '
                             'dana_tpu.parallel.distributed)')
    parser.add_argument('--coordinator', default=None, type=str,
                        help='--dist coordinator host:port (omit on TPU '
                             'pods: auto-detected from the environment)')
    parser.add_argument('--num_procs', default=None, type=int,
                        help='--dist process count (omit on TPU pods)')
    parser.add_argument('--proc_id', default=None, type=int,
                        help='--dist process rank (omit on TPU pods)')
    parser.add_argument('--set', dest='set_cfgs_extra', nargs='*',
                        default=None,
                        help='extra config overrides: KEY VALUE ...')
    args = parser.parse_args(argv)

    # anchor-scale presets (reference utils.py:68-73)
    if args.ascale == 3:
        args.set_cfgs = ['ANCHOR_SCALES', '[8, 16, 32]',
                         'ANCHOR_RATIOS', '[0.5,1,2]',
                         'MAX_NUM_GT_BOXES', '30']
    elif args.ascale == 4:
        args.set_cfgs = ['ANCHOR_SCALES', '[4, 8, 16, 32]',
                         'ANCHOR_RATIOS', '[0.5,1,2]',
                         'MAX_NUM_GT_BOXES', '50']
    else:
        raise Exception(f'invalid anchor scale {args.ascale}')

    # dataset-name -> imdb-name mapping (reference utils.py:74-104)
    mapping = {
        'pascal_voc': ('voc_2007_trainval', 'voc_2007_test'),
        'coco': ('coco_2014_train', 'coco_2014_minival'),
        'coco_base': ('coco_60_set1', None),
        'coco_ft': ('coco_ft_shot30', None),
        'val2014_novel': (None, 'coco_20_set1'),
        'val2014_base': (None, 'coco_20_set2'),
        'synth': ('synth_train', 'synth_test'),
    }
    if args.dataset in mapping:
        train_name, val_name = mapping[args.dataset]
        if train_name:
            args.imdb_name = train_name
        if val_name:
            args.imdbval_name = val_name
    elif args.dataset.startswith(('coco_', 'synth_', 'ycb2d_', 'voc_')):
        args.imdb_name = args.dataset
        args.imdbval_name = args.dataset
    else:
        raise Exception(f'dataset {args.dataset} not defined')

    args.cfg_file = os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'cfgs',
        'res101_ls.yml' if args.large_scale else 'res50.yml')
    return args


def enable_compilation_cache():
    """Persistent XLA compile cache: repeat CLI/bench invocations reuse
    compiled executables instead of re-optimizing the fused train graph
    (minutes of XLA time for the full detector)."""
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax_dana'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def load_cfg(args):
    enable_compilation_cache()
    from dana_tpu.utils.config import cfg, cfg_from_file, cfg_from_list
    if args.cfg_file and os.path.exists(args.cfg_file):
        cfg_from_file(args.cfg_file)
    if getattr(args, 'set_cfgs', None):
        cfg_from_list(args.set_cfgs)
    if getattr(args, 'set_cfgs_extra', None):
        cfg_from_list(args.set_cfgs_extra)
    cfg.TRAIN.USE_FLIPPED = args.use_flip
    return cfg


def _dt_or_none(name):
    """'' -> None (follow compute_dtype); else the jnp dtype.  Rejects
    unknown strings loudly — a typo'd precision knob must not silently
    run in f32."""
    if not name:
        return None
    import jax.numpy as jnp
    table = {'bfloat16': jnp.bfloat16, 'bf16': jnp.bfloat16,
             'float32': jnp.float32, 'f32': jnp.float32}
    if name not in table:
        raise ValueError(f'unknown dtype {name!r} for a TPU.*_DTYPE '
                         f'setting (use one of {sorted(table)})')
    return table[name]


def model_config_kwargs(way, shot, arch='resnet50'):
    """DanaConfig kwargs derived from the global cfg — the single place
    cfg keys map onto the model config, shared by get_model and
    tools/export_serving.py (so exported artifacts honor the same YAML/
    --set model settings the CLIs do)."""
    import jax.numpy as jnp

    from dana_tpu.utils.config import cfg

    return dict(
        n_way=way, n_shot=shot, arch=arch,
        anchor_scales=tuple(cfg.ANCHOR_SCALES),
        anchor_ratios=tuple(cfg.ANCHOR_RATIOS),
        pooling_mode=cfg.POOLING_MODE,
        pooling_size=cfg.POOLING_SIZE,
        train_pre_nms=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
        train_post_nms=cfg.TRAIN.RPN_POST_NMS_TOP_N,
        test_pre_nms=cfg.TEST.RPN_PRE_NMS_TOP_N,
        test_post_nms=cfg.TEST.RPN_POST_NMS_TOP_N,
        nms_cap=cfg.TPU.NMS_MAX_INPUT,
        rois_per_image=cfg.TRAIN.BATCH_SIZE,
        rpn_batchsize=cfg.TRAIN.RPN_BATCHSIZE,
        bbox_normalize_means=tuple(cfg.TRAIN.BBOX_NORMALIZE_MEANS),
        bbox_normalize_stds=tuple(cfg.TRAIN.BBOX_NORMALIZE_STDS),
        bn_train=cfg.TRAIN.BN_TRAIN,
        # int8 serving mode also routes the RoIAlign matmul onto the
        # int8 MXU (inference only; ops/roi_align.py)
        roi_align_int8=bool(cfg.TPU.QUANT_INT8),
        # trade one extra backbone forward for ~1/3 less peak HBM
        # (cfg.TPU.REMAT_BACKBONE; numerically identical — test pinned)
        remat_backbone=bool(cfg.TPU.REMAT_BACKBONE),
        # bf16 MXU compute with f32 masters (cfg.TPU.COMPUTE_DTYPE;
        # 'float32' restores full-precision numerics for parity runs)
        compute_dtype=_dt_or_none(cfg.TPU.COMPUTE_DTYPE) or jnp.float32,
        # optional f32 islands under bf16 compute (PERF.md "bf16
        # compute and AP")
        attention_dtype=_dt_or_none(cfg.TPU.ATTENTION_DTYPE),
        head_dtype=_dt_or_none(cfg.TPU.HEAD_DTYPE),
        # device-side mean subtraction for TPU.SHIP_UINT8 surfaces uses
        # the SAME means the f32 loader path subtracts on host
        pixel_means=tuple(np.asarray(cfg.PIXEL_MEANS).ravel().tolist()),
    )


def get_model(name, pretrained=True, use_BA_block=True, way=2, shot=3,
              classes=('fg', 'bg'), net='res50', seed=1996):
    """-> (DanaConfig, params).  Parity: reference utils.get_model
    (utils.py:108-127).  `name` is the framework (DAnA/cisa/frcnn/fsod/
    meta/fgn); backbone names alias to DAnA on that backbone."""
    from dana_tpu.models import dana

    if name in ('res50', 'res101', 'vgg16'):
        net, name = name, 'DAnA'
    arch = {'res50': 'resnet50', 'res101': 'resnet101',
            'vgg16': 'vgg16'}[net]
    common = model_config_kwargs(way, shot, arch)
    if name == 'DAnA':
        config = dana.DanaConfig(attention_type='concat',
                                 semantic_enhance=use_BA_block, **common)
    elif name == 'cisa':
        config = dana.DanaConfig(attention_type='concat',
                                 semantic_enhance=False, **common)
    elif name in ('frcnn', 'fsod', 'meta', 'fgn'):
        from dana_tpu.models import frameworks
        return frameworks.get_model(name, common, seed=seed)
    else:
        raise Exception(f'network {name} is not defined')
    params = dana.init_params(config, seed=seed)
    return config, params


def NMS(boxes, scores):
    """Class-agnostic host NMS helper (reference utils.py:312-317,
    TEST.NMS threshold).  Uses the native C++ host kernel
    (dana_tpu/native) — host arrays are small, a device round-trip
    costs more than the compute."""
    from dana_tpu import native
    from dana_tpu.utils.config import cfg
    return native.nms(np.asarray(boxes), np.asarray(scores), cfg.TEST.NMS)


def support_im_preprocess(im, cfg, support_size=320, n_of_shot=1):
    """BGR mean-sub 320-canvas support blob (reference utils.py:207-227) —
    bit-exact whole-image prep (blob.support_blob_whole: strict h>w
    branch, reference ratio-expression order)."""
    from dana_tpu.data import blob
    sup = blob.support_blob_whole(im, cfg.PIXEL_MEANS, support_size)
    return np.tile(sup[None], (n_of_shot, 1, 1, 1))


def query_im_preprocess(im, cfg):
    """600-shortest-side query blob (reference utils.py:229-239; the
    MAX_SIZE cap it nominally passes is inert in the reference —
    blob.py:44-46 comments it out)."""
    from dana_tpu.data import blob
    max_size = None if cfg.TPU.EXACT_QUERY_SCALE else cfg.TRAIN.MAX_SIZE
    im_data, im_info = blob.query_blob(im, cfg.PIXEL_MEANS,
                                       cfg.TRAIN.SCALES[0], max_size)
    return im_data, im_info


def generate_pseudo_label(output_dir, sp_dir, q_im_path, config, params,
                          num_shot):
    """Multi-shot detection union + NMS pseudo-labels
    (reference utils.py:182-204).  Support shots live at
    <sp_dir>/shot_<i>.jpg; returns the final [N, 5] detections."""
    from PIL import Image
    os.makedirs(output_dir, exist_ok=True)
    q_im = np.asarray(Image.open(q_im_path))[:, :, :3][:, :, ::-1]  # ->BGR
    dets = []
    for i in range(num_shot):
        sp = np.asarray(Image.open(
            os.path.join(sp_dir, f'shot_{i + 1}.jpg')))[:, :, :3][:, :, ::-1]
        dets.append(run_detection(sp, q_im, config, params))
    dets = np.concatenate(dets, axis=0)
    if num_shot > 1 and len(dets):
        order = np.argsort(-dets[:, 4])
        dets = dets[order]
        keep = NMS(dets[:, :4], dets[:, 4])
        dets = dets[keep]
    return dets


def create_annotation(nd_dir, cls_names, cls_im_inds, dump_path,
                      class_ids=None, im_hw=(256, 256)):
    """COCO-format annotation writer from per-image .npy box dumps
    (reference utils.py:130-179, generalized: class ids come from
    `class_ids` instead of the reference's hardcoded ycb map)."""
    import json
    class_ids = class_ids or {n: i + 1 for i, n in enumerate(cls_names)}
    categories = [{'supercategory': 'None', 'id': class_ids[n], 'name': n}
                  for n in cls_names]
    images, annotations = [], []
    for cls, inds in zip(cls_names, cls_im_inds):
        for ind in inds:
            images.append({'license': 1,
                           'file_name': str(ind).zfill(6) + '.jpg',
                           'height': im_hw[0], 'width': im_hw[1],
                           'id': int(ind)})
            boxes = np.load(os.path.join(nd_dir, str(ind).zfill(6) + '.npy'),
                            allow_pickle=True)
            for j, box in enumerate(np.asarray(boxes)):
                annotations.append({
                    'segmentation': [], 'area': float(
                        (box[2] - box[0]) * (box[3] - box[1])),
                    'iscrowd': 0, 'image_id': int(ind),
                    'bbox': [int(box[0]), int(box[1]),
                             int(box[2]) - int(box[0]),
                             int(box[3]) - int(box[1])],
                    'category_id': class_ids[cls],
                    'id': int(str(ind) + str(j))})
    with open(dump_path, 'w') as f:
        json.dump({'info': {}, 'licenses': [], 'images': images,
                   'annotations': annotations,
                   'categories': categories}, f)


def run_detection(support_im, query_im, config, params, thresh=0.5):
    """Single (support, query) pair -> detected boxes [N, 5]
    (reference utils.py:241-278)."""
    import jax.numpy as jnp
    from dana_tpu.models import dana
    from dana_tpu.engine.postprocess import postprocess_batch
    from dana_tpu.utils.config import cfg as gcfg

    sup = support_im_preprocess(support_im, gcfg,
                                n_of_shot=config.n_shot)[None]
    q, info = query_im_preprocess(query_im, gcfg)
    out = dana.forward(params, config, jnp.asarray(q[None]),
                       jnp.asarray(info[None]), jnp.asarray(sup),
                       training=False)
    dets, valid = postprocess_batch(
        out['rois'], out['cls_prob'], out['bbox_pred'],
        jnp.asarray(info[None]),
        bbox_stds=tuple(gcfg.TRAIN.BBOX_NORMALIZE_STDS),
        bbox_means=tuple(gcfg.TRAIN.BBOX_NORMALIZE_MEANS),
        nms_thresh=gcfg.TEST.NMS)
    dets = np.asarray(dets[0])[np.asarray(valid[0])]
    return dets[dets[:, 4] >= thresh]
