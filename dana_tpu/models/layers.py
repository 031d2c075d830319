"""Functional NN building blocks (NHWC, pytree params).

Params are plain nested dicts whose key paths mirror the reference torch
module names (e.g. ``layer1.0.conv1.weight``) flattened one module per dict
level, so converting a torch state_dict is a mechanical transpose
(OIHW -> HWIO for convs, [out,in] -> [in,out] for linears).

BatchNorm is always *frozen* here: the reference trains every framework
with BN in eval mode and requires_grad=False
(/root/reference/lib/model/framework/dana.py:362-385), so BN is a pure
affine transform with baked running statistics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x, params, stride=1, padding='SAME', dilation=1):
    """2-D convolution, NHWC activations x HWIO weights.

    `padding` may be 'SAME', 'VALID', an int (symmetric explicit pad), or an
    explicit ((top, bottom), (left, right)) pair.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if 'w_int8' in params:
        # int8-quantized conv (dana_tpu/quant.py): s8 x s8 -> s32 runs
        # at up to 2x the bf16 MXU rate on v5e
        return _dynamic_int8_conv(x, params['w_int8'], params['w_scale'],
                                  params.get('bias'), stride, padding,
                                  dilation)
    # mixed precision: params are f32 masters; compute in the activation
    # dtype (bf16 on the MXU when cfg.TPU.COMPUTE_DTYPE asks for it)
    w = params['weight'].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if 'bias' in params:
        y = y + params['bias'].astype(y.dtype)
    return y


def _dynamic_int8_conv(x, w_int8, w_scale, bias, stride, padding,
                       dilation=(1, 1)):
    """Dynamically-quantized int8 convolution (dana_tpu/quant.py).

    The activation scale is a traced per-tensor max-abs (symmetric, so
    zero padding stays exact); the weight is pre-quantized per-output-
    channel.  Output rescales to f32 and returns in the activation
    dtype, so the surrounding graph (residual adds, relu) is unchanged.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    sx = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, w_int8, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * w_scale)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


def frozen_batchnorm(x, params, eps=1e-5):
    """BatchNorm in eval mode: affine with stored running stats.

    The (scale, offset) pair is computed from (weight, bias, running_mean,
    running_var) at trace time; XLA folds it into the preceding conv.
    """
    inv = jax.lax.rsqrt(params['running_var'] + eps)
    scale = params['weight'] * inv
    offset = params['bias'] - params['running_mean'] * scale
    return x * scale.astype(x.dtype) + offset.astype(x.dtype)


def linear(x, params):
    """x [..., in] @ weight [in, out] + bias."""
    y = x @ params['weight'].astype(x.dtype)
    if 'bias' in params:
        y = y + params['bias'].astype(y.dtype)
    return y


def max_pool(x, window=3, stride=2, padding=0, ceil_mode=False):
    """Max pool over NHWC spatial dims with torch padding/ceil semantics.

    The reference backbone uses kernel 3, stride 2, padding 0, ceil_mode=True
    (resnet.py:113); torch's ceil_mode pads only on the bottom/right with -inf
    so every input cell lands in some window.
    """
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    _, h, w, _ = x.shape

    def pad_amount(size, win, st):
        if ceil_mode:
            out = math.ceil((size + 2 * padding - win) / st) + 1
            # torch: last window must start inside the (left-padded) input
            if (out - 1) * st >= size + padding:
                out -= 1
        else:
            out = (size + 2 * padding - win) // st + 1
        return max(0, (out - 1) * st + win - size - padding)

    pads = ((0, 0),
            (padding, pad_amount(h, window[0], stride[0])),
            (padding, pad_amount(w, window[1], stride[1])),
            (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *window, 1), (1, *stride, 1),
        [(int(a), int(b)) for a, b in pads])


def avg_pool(x, window, stride=None, padding=0):
    """Average pool (count includes padding, matching torch default
    count_include_pad=True)."""
    if isinstance(window, int):
        window = (window, window)
    stride = stride or window
    if isinstance(stride, int):
        stride = (stride, stride)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, *window, 1), (1, *stride, 1), pads)
    return s / (window[0] * window[1])


# ----------------------------------------------------------------------------
# Parameter initializers (numpy RNG at build time; converted to jnp on use).
# ----------------------------------------------------------------------------

def init_conv(rng: np.random.Generator, kh, kw, cin, cout, bias=False,
              std=None):
    """He-normal conv init (matching resnet.py:125-127: std=sqrt(2/fan_out))."""
    if std is None:
        std = math.sqrt(2.0 / (kh * kw * cout))
    p = {'weight': rng.normal(0.0, std, (kh, kw, cin, cout)).astype(np.float32)}
    if bias:
        p['bias'] = np.zeros((cout,), np.float32)
    return p


def batchnorm_train(x, params, momentum=0.1, eps=1e-5):
    """BatchNorm in TRAIN mode (torch BatchNorm2d semantics): normalize
    with the batch's biased mean/var over (N, H, W), update running stats
    with momentum (running_var gets the UNBIASED batch variance).

    x: [N, H, W, C].  Returns (y, new_stats) where new_stats carries the
    updated running_mean/running_var to merge back into the param tree
    (functional equivalent of torch's in-place buffer update)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    mean = xf.mean(axis=axes)
    var = ((xf - mean) ** 2).mean(axis=axes)           # biased
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * inv * params['weight'] + params['bias']
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        'running_mean': ((1 - momentum) * params['running_mean']
                         + momentum * mean),
        'running_var': ((1 - momentum) * params['running_var']
                        + momentum * unbiased),
    }
    return y.astype(x.dtype), new_stats


def init_bn(c):
    return {'weight': np.ones((c,), np.float32),
            'bias': np.zeros((c,), np.float32),
            'running_mean': np.zeros((c,), np.float32),
            'running_var': np.ones((c,), np.float32)}


def init_linear(rng: np.random.Generator, cin, cout, std=0.01, bias=True):
    p = {'weight': rng.normal(0.0, std, (cin, cout)).astype(np.float32)}
    if bias:
        p['bias'] = np.zeros((cout,), np.float32)
    return p


def to_jnp(tree, dtype=None):
    """Convert a numpy param tree to jnp arrays (optionally casting floats)."""
    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a
    return jax.tree.map(conv, tree)
