"""Three-tier config system: defaults <- YAML experiment file <- CLI pairs.

Key names and default values mirror the reference config
(/root/reference/lib/model/utils/config.py:11-303) so the shipped
cfgs/*.yml files keep working unchanged.  The implementation is our own
attribute-dict with type-checked merging (no easydict dependency).
"""

from __future__ import annotations

import copy
from ast import literal_eval

import numpy as np
import yaml


class AttrDict(dict):
    """dict with attribute access; nested dicts are converted recursively."""

    def __init__(self, d=None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = AttrDict(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        return copy.deepcopy(self)


def _default_cfg() -> AttrDict:
    c = AttrDict()

    # ---------------- Training options ----------------
    c.TRAIN = AttrDict()
    c.TRAIN.LEARNING_RATE = 0.001
    c.TRAIN.MOMENTUM = 0.9
    c.TRAIN.WEIGHT_DECAY = 0.0005
    c.TRAIN.GAMMA = 0.1
    c.TRAIN.STEPSIZE = [30000]
    c.TRAIN.DISPLAY = 10
    c.TRAIN.DOUBLE_BIAS = True
    c.TRAIN.TRUNCATED = False
    c.TRAIN.BIAS_DECAY = False
    c.TRAIN.USE_GT = False
    c.TRAIN.ASPECT_GROUPING = False
    c.TRAIN.SNAPSHOT_KEPT = 3
    c.TRAIN.SUMMARY_INTERVAL = 180
    c.TRAIN.SCALES = (600,)
    c.TRAIN.MAX_SIZE = 1000
    c.TRAIN.TRIM_HEIGHT = 600
    c.TRAIN.TRIM_WIDTH = 600
    c.TRAIN.IMS_PER_BATCH = 1
    c.TRAIN.BATCH_SIZE = 128          # rois per image in the rcnn head
    c.TRAIN.FG_FRACTION = 0.25
    c.TRAIN.FG_THRESH = 0.5
    c.TRAIN.BG_THRESH_HI = 0.5
    c.TRAIN.BG_THRESH_LO = 0.1
    c.TRAIN.USE_FLIPPED = True
    c.TRAIN.BBOX_REG = True
    c.TRAIN.BBOX_THRESH = 0.5
    c.TRAIN.SNAPSHOT_ITERS = 5000
    c.TRAIN.SNAPSHOT_PREFIX = 'res101_faster_rcnn'
    c.TRAIN.BBOX_NORMALIZE_TARGETS = True
    c.TRAIN.BBOX_INSIDE_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    c.TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED = True
    c.TRAIN.BBOX_NORMALIZE_MEANS = (0.0, 0.0, 0.0, 0.0)
    c.TRAIN.BBOX_NORMALIZE_STDS = (0.1, 0.1, 0.2, 0.2)
    c.TRAIN.PROPOSAL_METHOD = 'gt'
    c.TRAIN.HAS_RPN = True
    c.TRAIN.RPN_POSITIVE_OVERLAP = 0.7
    c.TRAIN.RPN_NEGATIVE_OVERLAP = 0.3
    c.TRAIN.RPN_CLOBBER_POSITIVES = False
    c.TRAIN.RPN_FG_FRACTION = 0.5
    c.TRAIN.RPN_BATCHSIZE = 256
    c.TRAIN.RPN_NMS_THRESH = 0.7
    c.TRAIN.RPN_PRE_NMS_TOP_N = 12000
    c.TRAIN.RPN_POST_NMS_TOP_N = 2000
    c.TRAIN.RPN_MIN_SIZE = 8
    c.TRAIN.RPN_BBOX_INSIDE_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    c.TRAIN.RPN_POSITIVE_WEIGHT = -1.0
    c.TRAIN.USE_ALL_GT = True
    c.TRAIN.BN_TRAIN = False

    # ---------------- Testing options ----------------
    c.TEST = AttrDict()
    c.TEST.SCALES = (600,)
    c.TEST.MAX_SIZE = 1000
    c.TEST.NMS = 0.3
    c.TEST.SVM = False
    c.TEST.BBOX_REG = True
    c.TEST.HAS_RPN = False
    c.TEST.PROPOSAL_METHOD = 'gt'
    c.TEST.RPN_NMS_THRESH = 0.7
    c.TEST.RPN_PRE_NMS_TOP_N = 6000
    c.TEST.RPN_POST_NMS_TOP_N = 300
    c.TEST.RPN_MIN_SIZE = 16
    c.TEST.MODE = 'nms'
    c.TEST.RPN_TOP_N = 5000

    # ---------------- ResNet options ----------------
    c.RESNET = AttrDict()
    c.RESNET.MAX_POOL = False
    c.RESNET.FIXED_BLOCKS = 1

    # ---------------- MobileNet options (API surface parity) ------------
    c.MOBILENET = AttrDict()
    c.MOBILENET.REGU_DEPTH = False
    c.MOBILENET.FIXED_LAYERS = 5
    c.MOBILENET.WEIGHT_DECAY = 0.00004
    c.MOBILENET.DEPTH_MULTIPLIER = 1.0

    # ---------------- MISC ----------------
    c.DEDUP_BOXES = 1.0 / 16.0
    c.DATA_DIR = 'data'
    c.ROOT_DIR = '.'
    # legacy VOC-devkit MATLAB eval binary name (config.py:273); unused
    # by any FSOD flow but kept for unconditional key parity
    c.MATLAB = 'matlab'
    # Pixel mean values (BGR order, Caffe convention) as a (1, 1, 3) array.
    c.PIXEL_MEANS = np.array([[[102.9801, 115.9465, 122.7717]]])
    c.RNG_SEED = 3
    c.EPS = 1e-14
    c.EXP_DIR = 'default'
    c.USE_GPU_NMS = True
    c.GPU_ID = 0
    c.POOLING_MODE = 'crop'
    c.POOLING_SIZE = 7
    c.MAX_NUM_GT_BOXES = 20
    c.ANCHOR_SCALES = [8, 16, 32]
    c.ANCHOR_RATIOS = [0.5, 1, 2]
    c.FEAT_STRIDE = [16]
    c.CUDA = False
    c.CROP_RESIZE_WITH_MAX_POOL = True

    # ---------------- TPU-native additions ----------------
    c.TPU = AttrDict()
    # matmul/conv compute dtype for the CLIs.  'float32' by default:
    # measured on the synth e2e eval, running an f32-trained checkpoint
    # with bf16 compute costs real AP (0.175->0.119; PERF.md "bf16
    # compute and AP").  Set 'bfloat16' for throughput once the
    # checkpoint/eval pair is validated at that precision.
    c.TPU.COMPUTE_DTYPE = 'float32'
    # per-stage precision islands ('': follow COMPUTE_DTYPE).  Measured
    # on the synth e2e eval (PERF.md "bf16 compute and AP"): pure bf16
    # on an f32-trained checkpoint drops AP 0.175->0.119, and an f32
    # HEAD island alone (RPN conv heads + whole R-CNN head) recovers it
    # exactly at +4.7% forward cost, while bf16 attention is AP-neutral
    # (the CISA cores accumulate in f32 already).  HEAD_DTYPE therefore
    # defaults to 'float32' — a no-op under f32 compute, and the safe
    # AP-preserving configuration under bfloat16; set 'bfloat16'
    # explicitly for maximum-throughput at known AP cost.
    c.TPU.ATTENTION_DTYPE = ''
    c.TPU.HEAD_DTYPE = 'float32'
    c.TPU.PARAM_DTYPE = 'float32'
    # decoded-support FIFO cache entries in the episodic loaders (each
    # ~1.2 MB at 320^2 f32; re-decoding supports dominated host prep).
    # 0 disables.  2048 bounds each loader's cache at ~2.5 GB — TPU
    # hosts trade RAM for feed rate: a FIFO covering the whole crop pool
    # makes steady-state episode prep QUERY-bound (measured 4.3x the
    # 256-entry feed rate on a 2.7k-crop pool, PERF.md round-5 loader
    # feed study; uniform draws give hit rate ~= cap/pool, so size this
    # to the pool when RAM allows).  Pools far beyond any sane cap
    # (real-COCO 100k+ crops) instead lean on IMAGE_CACHE_MB below.
    c.TPU.SUPPORT_CACHE = 2048
    # Byte-bounded LRU of DECODED source images (uint8 BGR), shared by
    # every imread path (queries, support crops, directory pools).  On a
    # host whose cores cannot re-decode JPEGs at chip speed, a cache-hot
    # support crop costs crop+resize (~1 ms) instead of a full source
    # decode (~3-5 ms) — the fix for large support pools where the
    # crop-level FIFO above misses constantly (real COCO: 60 classes x
    # thousands of crops).  2048 MB holds ~2k decoded COCO images;
    # size toward ~60000 MB to hold all of train2014 on large-RAM
    # hosts.  0 disables.
    c.TPU.IMAGE_CACHE_MB = 2048
    # Query images are padded onto static (H, W) bucket canvases so each
    # bucket compiles exactly once (replaces per-batch dynamic padding).
    # Covers shortest-side-600 uncapped scaling up to aspect 2 (landscape,
    # portrait, near-square, wide); rarer aspects snap to a synthesized
    # canvas (blob.snap_bucket).
    c.TPU.SIZE_BUCKETS = [(608, 1024), (1024, 608), (704, 704),
                          (608, 1216), (1216, 608)]
    # The reference's MAX_SIZE long-side cap is commented out
    # (blob.py:44-46): its effective query scale is PURELY shortest-side.
    # True (default) reproduces that exactly; False restores the capped
    # py-faster-rcnn scaling using TRAIN/TEST.MAX_SIZE (explicit
    # deviation knob, bounds canvas sizes on memory-tight setups).
    c.TPU.EXACT_QUERY_SCALE = True
    # Training support crops: True (default) reproduces the reference's
    # scale-source-then-crop pipeline bit-for-bit (fs_loader.py:113-138;
    # blob.support_blob_exact — A/B-pinned); False keeps the single-pass
    # crop-then-resize approximation (one resampling instead of two,
    # ~same content, off-by-one short-side widths).
    c.TPU.EXACT_SUPPORT_SCALE = True
    # Host-side 2x2 space-to-depth packing of query/support images for
    # the ResNet stem (blob.s2d_pack -> resnet.conv1_s2d): the direct
    # 7x7/2 conv on 3 channels runs at 1.8% MFU (TPU lanes are 128 wide);
    # packing on the host makes the device stem a 4x4/1 conv over 12
    # channels (3.0 -> 1.7 ms per bs8 stem, exactness-tested).  The pack
    # costs ~12 ms/img of host numpy absorbed by the loader pipeline;
    # ignored for vgg16 (no 7x7/2 stem).
    c.TPU.STEM_S2D = True
    # Serve conv weights in int8 (post-training quantization,
    # dana_tpu/quant.py): BN folded into per-output-channel int8 conv
    # weights, dynamic per-tensor activation scales.  Inference-only;
    # off by default (bit-exact parity with the f32 reference path
    # wins).  QUANT_SCOPE 'tail' (default) quantizes only the MXU-bound
    # RoI tail (+4% e2e measured on v5e); 'all' also quantizes the
    # HBM-bound early backbone, which measured a net LOSS — kept as an
    # experiment knob.
    c.TPU.QUANT_INT8 = False
    c.TPU.QUANT_SCOPE = 'tail'
    # Ship query images to the device as RAW uint8 (mean subtraction
    # runs on device, fused into the stem): 4x less host->device
    # traffic — decisive on network-attached TPU (the remote tunnel
    # here moves ~60 MB/chunk of f32 at ~1-2 s/chunk), still a real
    # PCIe win on local hosts.  Off by default: the uint8 resize rounds
    # each pixel (<=1 LSB deviation vs the f32 reference path).
    c.TPU.SHIP_UINT8 = False
    # Cap on boxes entering fixed-shape NMS (memory/latency bound).
    # 12000 honors the reference's TRAIN.RPN_PRE_NMS_TOP_N in full: a
    # 6000 cap measured -0.25 proposal recall@0.5 where it binds
    # (tools/nms_cap_study.py; PERF.md round 3).  The tiled NMS's early
    # exit keeps the cost increase small; lower this on memory-tight
    # setups.
    c.TPU.NMS_MAX_INPUT = 12000
    c.TPU.MESH_DATA_AXIS = 'data'
    # rematerialize backbone activations in the backward pass
    # (jax.checkpoint around the trunk): ~1/3 less peak HBM per episodic
    # batch for one extra forward of conv FLOPs — enables larger bs/chip
    c.TPU.REMAT_BACKBONE = False

    return c


# Global config, consumed as `from dana_tpu.utils.config import cfg`
# (mirrors the reference's global `cfg` EasyDict).
cfg = _default_cfg()


def _merge_a_into_b(a: dict, b: AttrDict, path: str = '') -> None:
    """Type-checked recursive merge (semantics of reference config.py:338-368)."""
    if not isinstance(a, dict):
        return
    for k, v in a.items():
        if k not in b:
            raise KeyError(f'{path}{k} is not a valid config key')
        old = b[k]
        if isinstance(old, dict):
            if not isinstance(v, dict):
                raise ValueError(f'Type mismatch for config key {path}{k}')
            _merge_a_into_b(v, b[k], path=f'{path}{k}.')
            continue
        if old is not None and v is not None and type(old) is not type(v):
            if isinstance(old, np.ndarray):
                v = np.array(v, dtype=old.dtype)
            elif isinstance(old, float) and isinstance(v, int):
                v = float(v)
            elif isinstance(old, tuple) and isinstance(v, list):
                v = tuple(v)
            elif isinstance(old, list) and isinstance(v, tuple):
                v = list(v)
            else:
                raise ValueError(
                    f'Type mismatch ({type(old)} vs {type(v)}) for config key: {path}{k}')
        b[k] = v


def cfg_from_file(filename: str) -> None:
    """Load a YAML experiment file and merge it into the global config."""
    with open(filename) as f:
        yaml_cfg = yaml.safe_load(f)
    _merge_a_into_b(yaml_cfg, cfg)


def cfg_from_list(cfg_list) -> None:
    """Set config keys from a flat [key, value, key, value, ...] list."""
    assert len(cfg_list) % 2 == 0
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        keys = k.split('.')
        d = cfg
        for subkey in keys[:-1]:
            assert subkey in d, f'unknown config section {subkey}'
            d = d[subkey]
        subkey = keys[-1]
        assert subkey in d, f'unknown config key {k}'
        try:
            value = literal_eval(v)
        except (ValueError, SyntaxError):
            value = v
        old = d[subkey]
        if isinstance(old, tuple) and isinstance(value, list):
            value = tuple(value)
        if isinstance(old, float) and isinstance(value, int):
            value = float(value)
        assert type(value) is type(old) or old is None, (
            f'type {type(value)} does not match original type {type(old)} for {k}')
        d[subkey] = value


def reset_cfg() -> None:
    """Restore the global config to defaults (used by tests)."""
    fresh = _default_cfg()
    cfg.clear()
    cfg.update(fresh)
