"""RoI-tail (layer4) formulation experiment: conv vs shift-and-matmul.

The rcnn-head tail runs layer4 over [N=2400, 7, 7, 1024] RoI patches —
7.9 ms at 31% MFU (tools/profile_rcnn_head.py), the largest single
consumer after round 2.  Hypothesis: at 4x4 spatial extents XLA's conv
path (im2col) is overhead-bound; expressing the 1x1 convs as flat
matmuls and the single 3x3 as 9 shifted matmul-accumulates may map
better onto the MXU.

Verifies exactness vs resnet.top_forward on CPU-style f32 first, then
times both on the TPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_attrib import timed_device, V5E_BF16_PEAK


def _bn(p, dtype):
    w = p['weight'] * jax.lax.rsqrt(p['running_var'] + 1e-5)
    b = p['bias'] - p['running_mean'] * w
    return w.astype(dtype), b.astype(dtype)


def _matmul1x1(x, p, stride=1):
    """[N, H, W, Cin] 1x1 conv as flat matmul (+ even-position gather
    for the detection-style stride on conv1)."""
    if stride == 2:
        x = x[:, ::2, :: 2, :]
    n, h, w, c = x.shape
    wmat = p['weight'].reshape(c, -1).astype(x.dtype)
    return (x.reshape(-1, c) @ wmat).reshape(n, h, w, -1)


def _shift_matmul3x3(x, p):
    """3x3 pad-1 conv as 9 shifted matmuls on [N, H, W, C]."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wk = p['weight'].astype(x.dtype)          # [3,3,C,Cout]
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + w, :].reshape(-1, c)
            t = xs @ wk[dy, dx]
            out = t if out is None else out + t
    return out.reshape(n, h, w, -1)


def hand_tail(x, layer4, dtype):
    relu = jax.nn.relu
    for i in range(len(layer4)):
        p = layer4[str(i)]
        stride = 2 if i == 0 else 1
        o = _matmul1x1(x, p['conv1'], stride=stride)
        w, b = _bn(p['bn1'], o.dtype)
        o = relu(o * w + b)
        o = _shift_matmul3x3(o, p['conv2'])
        w, b = _bn(p['bn2'], o.dtype)
        o = relu(o * w + b)
        o = _matmul1x1(o, p['conv3'])
        w, b = _bn(p['bn3'], o.dtype)
        o = o * w + b
        if 'downsample' in p:
            r = _matmul1x1(x, p['downsample']['0'], stride=stride)
            w, b = _bn(p['downsample']['1'], r.dtype)
            r = r * w + b
        else:
            r = x
        x = relu(o + r)
    return x


def main():
    # exactness must not be judged through the TPU's bf16-pass f32
    # matmuls (rel err ~1e-3 from precision alone); bf16 timing below is
    # unaffected by this setting
    jax.config.update('jax_default_matmul_precision', 'highest')
    from dana_tpu.models import resnet
    from dana_tpu.models.layers import to_jnp

    params = resnet.init_params('resnet50', seed=0,
                                zero_init_residual=False)
    layer4 = params['layer4']
    pj = to_jnp({'layer4': layer4})['layer4']

    # exactness (f32, small N)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 7, 7, 1024)).astype(np.float32) * 0.05)
    ref = resnet.top_forward(x, {'layer4': pj}, 'resnet50')
    got = hand_tail(x, pj, jnp.float32)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f'exactness rel err: {err:.2e}')
    assert err < 1e-4, 'hand tail diverges'

    # timing (bf16, eval scale)
    n = 2400
    xb = jnp.asarray(np.random.default_rng(1).normal(
        size=(n, 7, 7, 1024)).astype(np.float32) * 0.05, jnp.bfloat16)

    def conv_tail(p, x):
        return resnet.top_forward(x, {'layer4': p}, 'resnet50')

    def mm_tail(p, x):
        return hand_tail(x, p, jnp.bfloat16)

    iters = int(os.environ.get('PROF_ITERS', '16'))
    for name, fn in [('conv_tail', conv_tail), ('shiftmm_tail', mm_tail)]:
        dt, flops = timed_device(fn, (pj, xb), iters)
        mfu = flops / dt / V5E_BF16_PEAK if dt > 0 else 0.0
        print(f'{name:14s} {dt * 1e3:8.3f} ms  {flops / 1e9:8.2f} GFLOP'
              f'  MFU {100 * mfu:5.1f}%', flush=True)


if __name__ == '__main__':
    main()
