"""Post-training int8 quantization of the conv backbone (inference).

TPU v5e executes s8 x s8 -> s32 convolutions at up to 2x the bf16 MXU
rate (measured 1.4-1.9x on this model's conv shapes — PERF.md round 3).
The forward is conv-bound (backbone + RoI tail = ~60% of device time),
so serving in int8 is the one remaining large per-chip lever after the
attention/head path was made memory-optimal.

Scheme (standard PTQ, no calibration data needed):

  * frozen BatchNorm folded EXACTLY into the preceding conv — BN here
    is always inference-mode affine (layers.frozen_batchnorm), so
    ``bn(conv(x, w)) == conv(x, w * s) + o`` holds to fp rounding;
  * weights quantized symmetric per-OUTPUT-CHANNEL int8 (HWIO, scale
    per O), the folded bias stays f32;
  * activations quantized DYNAMICALLY per-tensor: one max-abs
    reduction on device per conv input (a traced scalar — shapes stay
    static and XLA fuses the quantize into the producer).

``layers.conv2d`` (and the s2d stem path, resnet.conv1_s2d) dispatch on
the presence of ``w_int8`` in a conv param dict, so quantization is a
pure param-tree transform: no forward-code forks, and the non-conv path
(attention, RPN heads, RoIAlign, FFN) keeps full bf16/f32 precision.
Frozen-BN entries are rewritten to exact identities that XLA folds away.

The reference has no counterpart (it serves f32 CUDA,
/root/reference/inference.py:100-103); this is a TPU-serving feature.
Enable with ``--set TPU.QUANT_INT8 True`` on inference.py (training
always runs the float tree).  Accuracy/throughput: PERF.md round 3.
"""

from __future__ import annotations

import numpy as np

_BN_EPS = 1e-5


def _identity_bn(n):
    """Frozen-BN params that are an exact no-op through
    layers.frozen_batchnorm: var = 1 - eps makes rsqrt(var + eps) == 1."""
    return {
        'weight': np.ones(n, np.float32),
        'bias': np.zeros(n, np.float32),
        'running_mean': np.zeros(n, np.float32),
        'running_var': np.full(n, 1.0 - _BN_EPS, np.float32),
    }


def _fold_bn(conv, bn, eps=_BN_EPS):
    """Fold an inference-mode BN into the conv before it.

    y = (conv(x, w) + b) * s + o  with  s = g / sqrt(var + eps),
    o = beta - mean * s   ==>   conv(x, w * s) + (b * s + o).
    """
    w = np.asarray(conv['weight'], np.float32)             # HWIO
    s = np.asarray(bn['weight'], np.float32) / np.sqrt(
        np.asarray(bn['running_var'], np.float32) + eps)
    o = np.asarray(bn['bias'], np.float32) \
        - np.asarray(bn['running_mean'], np.float32) * s
    out = {'weight': w * s}                                # broadcast on O
    b = np.asarray(conv['bias'], np.float32) if 'bias' in conv else 0.0
    out['bias'] = b * s + o
    return out


def quantize_conv(conv):
    """Symmetric per-output-channel int8 quantization of a float conv.

    Returns {'w_int8' [HWIO s8], 'w_scale' [O f32], ('bias' f32)} — the
    marker dict layers._dynamic_int8_conv executes.
    """
    w = np.asarray(conv['weight'], np.float32)
    amax = np.abs(w).reshape(-1, w.shape[-1]).max(0)       # per O
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    out = {'w_int8': q, 'w_scale': scale.astype(np.float32)}
    if 'bias' in conv:
        out['bias'] = np.asarray(conv['bias'], np.float32)
    return out


def _quantize_block(blk):
    """Quantize one resnet basic/bottleneck block dict in place-copy."""
    out = {}
    for i in (1, 2, 3):
        ck, bk = f'conv{i}', f'bn{i}'
        if ck not in blk:
            continue
        out[ck] = quantize_conv(_fold_bn(blk[ck], blk[bk]))
        out[bk] = _identity_bn(len(blk[bk]['weight']))
    if 'downsample' in blk:
        ds = blk['downsample']
        out['downsample'] = {
            '0': quantize_conv(_fold_bn(ds['0'], ds['1'])),
            '1': _identity_bn(len(ds['1']['weight'])),
        }
    return out


def quantize_backbone(bb, scope='all'):
    """Quantize a resnet backbone param tree (models/resnet.py layout:
    conv1/bn1 + layer1..layer4 of blocks), or a VGG tree ('features':
    bare biased convs, no BN).  Non-conv leaves pass through.

    scope: 'all' quantizes every conv; 'tail' only layer4 (the RoI
    tail).  Measured on v5e (PERF.md round 3): the tail's 2400-RoI
    7x7/4x4 convs are MXU-bound and win from int8, while the early
    backbone is HBM/elementwise-bound — quantizing it is a net LOSS
    (the quantize passes cost more than the MXU time saved), so 'tail'
    is the production setting.
    """
    if 'features' in bb:                                   # vgg16
        out = dict(bb)
        if scope == 'all':
            out['features'] = {k: quantize_conv(v)
                               for k, v in bb['features'].items()}
        return out
    out = {}
    for key, val in bb.items():
        if key == 'conv1' and scope == 'all':
            out['conv1'] = quantize_conv(_fold_bn(bb['conv1'], bb['bn1']))
        elif key == 'bn1' and scope == 'all':
            out['bn1'] = _identity_bn(len(bb['bn1']['weight']))
        elif key.startswith('layer') and (
                scope == 'all' or (scope == 'tail' and key == 'layer4')):
            out[key] = {bi: _quantize_block(blk)
                        for bi, blk in val.items()}
        else:
            out[key] = val
    return out


def count_int8(tree):
    """Number of int8-quantized convs in a param tree (0 = the transform
    was a no-op, e.g. vgg16 with scope='tail')."""
    n = [0]

    def look(t):
        if isinstance(t, dict):
            if 'w_int8' in t:
                n[0] += 1
            for v in t.values():
                look(v)
    look(tree)
    return n[0]


def quantize_params(params, scope='tail'):
    """Quantize the 'backbone' subtree of a full model param tree (host
    numpy transform; call before layers.to_jnp / before sharding)."""
    import jax
    host = jax.tree.map(np.asarray, params)
    out = dict(host)
    out['backbone'] = quantize_backbone(host['backbone'], scope=scope)
    return out
