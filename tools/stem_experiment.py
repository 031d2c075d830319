"""Stem experiment: HOST-side space-to-depth (VERDICT r2 item 5b).

Round 2 measured the DEVICE-side s2d stem slower (6.3 ms vs 2.8 ms
direct at bs8 608x800) — the on-device reshape/transpose of a 3-channel
tensor costs more than the lane waste it removes.  The open lever is
doing the packing on the HOST (numpy, amortized behind the device by
the loader pipeline) and shipping [B, H/2+3, W/2+3, 12] to the device,
leaving only a dense 4x4/1 VALID conv (12 input channels instead of 3:
4x less lane waste).

This tool times, on the real TPU:
  1. the direct 7x7/2 stem conv on [bs, 608, 800, 3]   (today's path)
  2. the 4x4/1 conv on a PRE-PACKED s2d tensor          (candidate)
  3. both full stems (conv+bn+relu+ceil-maxpool)
and checks exactness of (2) against (1).

Usage: python tools/stem_experiment.py [--batch 8] [--iters 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tools.profile_attrib import timed_device, V5E_BF16_PEAK


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=16)
    args = ap.parse_args()

    from utils import enable_compilation_cache
    enable_compilation_cache()
    from dana_tpu.models import layers as L
    from dana_tpu.models import resnet
    from dana_tpu.data import blob

    bs, h, w = args.batch, 608, 800
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs, h, w, 3)).astype(np.float32))
    params = {'conv1': L.init_conv(rng, 7, 7, 3, 64),
              'bn1': L.init_bn(64)}
    # host-side pack (numpy) once, outside the timed region
    xd = jnp.asarray(blob.s2d_pack(np.asarray(x)))
    print(f'packed shape: {xd.shape} (from {x.shape})')

    cd = jnp.bfloat16

    def direct_conv(p, x):
        return L.conv2d(x.astype(cd), p['conv1'], stride=2, padding=3)

    def s2d_conv(p, xd):
        return resnet.conv1_s2d(xd.astype(cd), p['conv1'])

    def direct_stem(p, x):
        return resnet.stem(x.astype(cd), p)

    def s2d_stem(p, xd):
        return resnet.stem_s2d(xd.astype(cd), p)

    # exactness (f32)
    a = np.asarray(jax.jit(lambda p, x: L.conv2d(x, p['conv1'], stride=2,
                                                 padding=3))(params, x))
    b = np.asarray(jax.jit(lambda p, xd: resnet.conv1_s2d(
        xd, params['conv1']))(params, xd))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f'exactness (f32 rel err): {err:.2e}')
    assert err < 1e-5, err

    for name, fn, arg in [('direct 7x7/2 conv', direct_conv, x),
                          ('s2d 4x4/1 conv (pre-packed)', s2d_conv, xd),
                          ('direct full stem', direct_stem, x),
                          ('s2d full stem (pre-packed)', s2d_stem, xd)]:
        dt, flops = timed_device(fn, (params, arg), args.iters)
        mfu = flops / dt / V5E_BF16_PEAK if dt else 0.0
        print(f'{name:32s} {dt * 1e3:8.3f} ms  {flops / 1e9:7.2f} GFLOP '
              f' MFU {100 * mfu:5.1f}%', flush=True)

    # host packing cost (numpy, what the loader would absorb)
    import time
    xn = np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(10):
        blob.s2d_pack(xn)
    t_pack = (time.perf_counter() - t0) / 10
    print(f'host s2d_pack cost: {t_pack * 1e3:.2f} ms per bs{bs} batch '
          f'(numpy, hidden behind device compute by the loader pipeline)')


if __name__ == '__main__':
    main()
