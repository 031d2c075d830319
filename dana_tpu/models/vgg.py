"""VGG16 detection backbone.

The reference advertises --net vgg16 (utils.py:28, cfgs/vgg16.yml) but
ships no implementation — all frameworks hardcode resnet50 (SURVEY §2.2).
This is the standard py-faster-rcnn VGG16 split the cfg implies:
conv1_1..conv5_3 *without* the fifth maxpool as the stride-16 base
(512 ch), and the fc6/fc7 4096-d classifier as the RoI tail.  Param keys
follow torchvision vgg16 ('features.0.weight', 'classifier.0.weight') so
torchvision checkpoints convert via `convert_torch_vgg16`.
"""

from __future__ import annotations

import numpy as np

from dana_tpu.models import layers as L

# torchvision vgg16 features layer indices: conv layers + 'M' maxpools
_VGG16_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512]
# conv layer index in nn.Sequential(features): convs sit at these positions
_CONV_IDX = []
_i = 0
for _v in _VGG16_CFG:
    if _v == 'M':
        _i += 1
    else:
        _CONV_IDX.append(_i)
        _i += 2          # conv + relu


def init_params(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    features = {}
    cin = 3
    for idx, v in zip(_CONV_IDX, [v for v in _VGG16_CFG if v != 'M']):
        features[str(idx)] = L.init_conv(rng, 3, 3, cin, v, bias=True)
        cin = v
    classifier = {
        '0': L.init_linear(rng, 512 * 7 * 7, 4096, std=0.01),
        '3': L.init_linear(rng, 4096, 4096, std=0.01),
    }
    return {'features': features, 'classifier': classifier}


def base_forward(x, params):
    """conv1_1..conv5_3, pools after blocks 1-4 only -> [B,H/16,W/16,512]."""
    feats = params['features']
    ci = 0
    convs = [v for v in _VGG16_CFG if v != 'M']
    k = 0
    for v in _VGG16_CFG:
        if v == 'M':
            x = L.max_pool(x, window=2, stride=2, padding=0)
        else:
            x = L.relu(L.conv2d(x, feats[str(_CONV_IDX[k])], padding=1))
            k += 1
    del ci, convs
    return x


def tail_forward(pooled, params):
    """fc6/fc7 on [..., 7, 7, 512] -> [..., 4096].

    torchvision fc6 expects the CHW-flattened layout; inputs here are HWC,
    so convert before flattening to keep checkpoint parity."""
    import jax.numpy as jnp
    lead = pooled.shape[:-3]
    x = jnp.moveaxis(pooled, -1, -3).reshape(*lead, -1)
    x = L.relu(L.linear(x, params['classifier']['0']))
    x = L.relu(L.linear(x, params['classifier']['3']))
    return x


def convert_torch_vgg16(state_dict) -> dict:
    """torchvision vgg16 state_dict -> our param tree (drops classifier.6)."""
    out = {'features': {}, 'classifier': {}}
    for key, val in state_dict.items():
        v = np.asarray(getattr(val, 'numpy', lambda: val)())
        section, idx, leaf = key.split('.')
        if section == 'classifier' and idx == '6':
            continue
        if v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:
            v = v.T
        out[section].setdefault(idx, {})[leaf] = v.astype(np.float32)
    return out
