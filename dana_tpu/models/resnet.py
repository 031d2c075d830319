"""Functional ResNet backbone with the two detection-specific diffs of the
reference (/root/reference/lib/model/framework/resnet.py):

  * stride lives on conv1 of the Bottleneck, not conv2 (resnet.py:71)
  * stem maxpool is kernel 3 / stride 2 / padding 0 / ceil_mode=True
    (resnet.py:113)

Layout is NHWC / HWIO (TPU-native).  Param trees mirror the torch
state_dict key structure (``layer1.0.downsample.0.weight`` etc.) so
reference Caffe checkpoints convert 1:1 (`convert_torch_state_dict`).

The detector split follows dana.py:344-346: ``RCNN_base`` = conv1..layer3
(1024 ch, stride 16), ``RCNN_top`` = layer4 (2048 ch).  All BatchNorms are
frozen (dana.py:362-385), so forward is inference-mode affine BN always.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dana_tpu.models import layers as L
from dana_tpu.models.layers import relu as _relu

ARCH_LAYERS = {
    'resnet18': ('basic', [2, 2, 2, 2]),
    'resnet34': ('basic', [3, 4, 6, 3]),
    'resnet50': ('bottleneck', [3, 4, 6, 3]),
    'resnet101': ('bottleneck', [3, 4, 23, 3]),
    'resnet152': ('bottleneck', [3, 8, 36, 3]),
}


def _bottleneck(x, p, stride):
    out = L.conv2d(x, p['conv1'], stride=stride, padding='VALID')
    out = L.frozen_batchnorm(out, p['bn1'])
    out = _relu(out)
    out = L.conv2d(out, p['conv2'], stride=1, padding=1)
    out = L.frozen_batchnorm(out, p['bn2'])
    out = _relu(out)
    out = L.conv2d(out, p['conv3'], stride=1, padding='VALID')
    out = L.frozen_batchnorm(out, p['bn3'])
    if 'downsample' in p:
        residual = L.conv2d(x, p['downsample']['0'], stride=stride,
                            padding='VALID')
        residual = L.frozen_batchnorm(residual, p['downsample']['1'])
    else:
        residual = x
    return _relu(out + residual)


def _basic_block(x, p, stride):
    out = L.conv2d(x, p['conv1'], stride=stride, padding=1)
    out = L.frozen_batchnorm(out, p['bn1'])
    out = _relu(out)
    out = L.conv2d(out, p['conv2'], stride=1, padding=1)
    out = L.frozen_batchnorm(out, p['bn2'])
    if 'downsample' in p:
        residual = L.conv2d(x, p['downsample']['0'], stride=stride,
                            padding='VALID')
        residual = L.frozen_batchnorm(residual, p['downsample']['1'])
    else:
        residual = x
    return _relu(out + residual)


def _layer(x, p, stride, block_fn):
    for i in range(len(p)):
        x = block_fn(x, p[str(i)], stride if i == 0 else 1)
    return x


def _conv7x7s2_s2d(x, params):
    """conv1 (7x7/2, pad 3) via 2x2 space-to-depth + 4x4/1 conv.

    Mathematically identical to the direct convolution (the MLPerf
    ResNet stem trick): the 3-channel input uses 3/128 of a TPU lane
    tile, so the direct stem measured 1.7% MFU / 2.8 ms per bs-8 batch
    — 41% of the whole query backbone.  Packing a 2x2 pixel block into
    12 channels and rewriting the (zero-padded-to-8x8) kernel as 4x4
    over those 12 channels quarters the lane waste.

    Derivation: with pad 3 applied first, the output window for row i
    covers padded rows [2i, 2i+7] — 8 consecutive rows starting even,
    i.e. exactly 4 space-to-depth blocks, so an 8x8/2 kernel (= 7x7
    zero-extended bottom/right) becomes a VALID 4x4/1 kernel over the
    s2d tensor.  Requires even H, W (true for all bucketed shapes);
    callers fall back to the direct conv otherwise.
    """
    b, h, w, c = x.shape
    out_h, out_w = (h + 6 - 7) // 2 + 1, (w + 6 - 7) // 2 + 1
    # padded extent must cover [2*(out-1), 2*(out-1)+7]
    ph = 2 * (out_h - 1) + 8 - h
    pw = 2 * (out_w - 1) + 8 - w
    xp = jnp.pad(x, ((0, 0), (3, ph - 3), (3, pw - 3), (0, 0)))
    hp, wp = xp.shape[1:3]
    xd = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    xd = xd.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2,
                                                4 * c)
    w4 = _stem_w4(params['weight'])
    y = jax.lax.conv_general_dilated(
        xd, w4.astype(x.dtype), window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if 'bias' in params:
        y = y + params['bias'].astype(y.dtype)
    return y


def _stem_w4(w7):
    """Rewrite a [7,7,C,O] stem kernel as the [4,4,4C,O] s2d kernel
    (zero-extend to 8x8, split per 2x2 phase)."""
    c, cout = w7.shape[2], w7.shape[3]
    w8 = jnp.pad(w7, ((0, 1), (0, 1), (0, 0), (0, 0)))      # [8,8,C,O]
    w4 = w8.reshape(4, 2, 4, 2, c, cout)
    return w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, cout)


def conv1_s2d(xd, conv1):
    """conv1 on a HOST-packed space-to-depth input (blob.s2d_pack):
    dense 4x4/1 VALID conv over 12 channels.  The 7x7 kernel is
    zero-extended to 8x8 and rewritten per 2x2 phase (same transform as
    _conv7x7s2_s2d, but the reshape/transpose happened on the host)."""
    if 'w_int8' in conv1:
        # int8-quantized stem (dana_tpu/quant.py): the kernel rewrite is
        # a zero-pad + reshape, which preserves the per-O quantization
        return L._dynamic_int8_conv(xd, _stem_w4(conv1['w_int8']),
                                    conv1['w_scale'], conv1.get('bias'),
                                    (1, 1), 'VALID')
    w4 = _stem_w4(conv1['weight'])
    y = jax.lax.conv_general_dilated(
        xd, w4.astype(xd.dtype), window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if 'bias' in conv1:
        y = y + conv1['bias'].astype(y.dtype)
    return y


def stem(x, params):
    """conv1 + bn1 + relu + ceil-mode maxpool (resnet.py:111-113).

    Two input layouts, dispatched statically on the channel count:
      * [B, H, W, 3] — the direct 7x7/2 convolution.
      * [B, H/2+3, W/2+3, 12] — HOST-packed space-to-depth
        (blob.s2d_pack): only the dense 4x4/1 conv runs on device.
        The DEVICE-side s2d rewrite (_conv7x7s2_s2d) was measured
        SLOWER on v5e (6.3 ms vs 2.8 ms at bs8 608x800) because the
        3-channel reshape/transpose is lane-padded 3->128; host packing
        removes that cost from the device entirely."""
    if x.shape[-1] == 12:
        x = conv1_s2d(x, params['conv1'])
    else:
        x = L.conv2d(x, params['conv1'], stride=2, padding=3)
    x = L.frozen_batchnorm(x, params['bn1'])
    x = _relu(x)
    return L.max_pool(x, window=3, stride=2, padding=0, ceil_mode=True)


def stem_s2d(xd, params):
    """Full stem on a host-packed input (tools/stem_experiment.py)."""
    return stem(xd, params)


def base_forward(x, params, arch='resnet50'):
    """RCNN_base: stem + layer1..layer3 -> [B, H/16, W/16, 1024]."""
    kind, _ = ARCH_LAYERS[arch]
    block = _bottleneck if kind == 'bottleneck' else _basic_block
    x = stem(x, params)
    x = _layer(x, params['layer1'], 1, block)
    x = _layer(x, params['layer2'], 2, block)
    x = _layer(x, params['layer3'], 2, block)
    return x


def top_forward(x, params, arch='resnet50'):
    """RCNN_top: layer4 -> [..., 2048] features (stride 2)."""
    kind, _ = ARCH_LAYERS[arch]
    block = _bottleneck if kind == 'bottleneck' else _basic_block
    return _layer(x, params['layer4'], 2, block)


# ----------------------------------------------------------------------------
# Init + torch checkpoint conversion
# ----------------------------------------------------------------------------

def init_params(arch='resnet50', seed=0, zero_init_residual=True):
    """Random-init backbone params (He conv init, resnet.py:124-130).

    zero_init_residual zeroes the last conv weight of every block
    (SkipInit) so each residual branch starts as identity but stays
    trainable.  The reference never trains from random init (it always
    loads Caffe weights, dana.py:339-341) — with frozen identity BNs,
    plain He init doubles activation variance per block and a ResNet-50
    forward explodes by ~2^16; SkipInit keeps random-init forwards sane
    (e.g. the synthetic-dataset CLI runs)."""
    kind, counts = ARCH_LAYERS[arch]
    rng = np.random.default_rng(seed)
    expansion = 4 if kind == 'bottleneck' else 1
    params = {'conv1': L.init_conv(rng, 7, 7, 3, 64), 'bn1': L.init_bn(64)}
    inplanes = 64
    for li, (planes, blocks) in enumerate(zip([64, 128, 256, 512], counts)):
        layer = {}
        stride = 1 if li == 0 else 2
        for b in range(blocks):
            s = stride if b == 0 else 1
            out = planes * expansion
            if kind == 'bottleneck':
                blk = {
                    'conv1': L.init_conv(rng, 1, 1, inplanes, planes),
                    'bn1': L.init_bn(planes),
                    'conv2': L.init_conv(rng, 3, 3, planes, planes),
                    'bn2': L.init_bn(planes),
                    'conv3': L.init_conv(rng, 1, 1, planes, out),
                    'bn3': L.init_bn(out),
                }
            else:
                blk = {
                    'conv1': L.init_conv(rng, 3, 3, inplanes, planes),
                    'bn1': L.init_bn(planes),
                    'conv2': L.init_conv(rng, 3, 3, planes, planes),
                    'bn2': L.init_bn(planes),
                }
            if zero_init_residual:
                # zero the last *conv* (trainable), not the frozen BN gamma
                last_conv = 'conv3' if kind == 'bottleneck' else 'conv2'
                blk[last_conv]['weight'] = \
                    np.zeros_like(blk[last_conv]['weight'])
            if s != 1 or inplanes != out:
                blk['downsample'] = {
                    '0': L.init_conv(rng, 1, 1, inplanes, out),
                    '1': L.init_bn(out),
                }
            layer[str(b)] = blk
            inplanes = out
        params[f'layer{li + 1}'] = layer
    return params


def convert_torch_state_dict(state_dict):
    """Convert a torch ResNet state_dict (numpy values or torch tensors) to
    our nested NHWC param tree.  Ignores fc.* (the detector drops it,
    dana.py:344-346) and num_batches_tracked buffers."""
    out = {}
    for key, val in state_dict.items():
        if key.startswith('fc.') or key.endswith('num_batches_tracked'):
            continue
        v = np.asarray(getattr(val, 'numpy', lambda: val)())
        parts = key.split('.')
        leaf = parts[-1]
        if v.ndim == 4:  # conv OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = v.astype(np.float32)
    return out
