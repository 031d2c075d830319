"""Backbone stage attribution (TPU): stem / layer1 / layer2 / layer3.

Locates the query-backbone time (7 ms/batch at bs8, 17% MFU in
profile_attrib) before attempting targeted fixes (space-to-depth stem,
layout tweaks).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_attrib import timed_device, V5E_BF16_PEAK


def main():
    from dana_tpu.models import dana, resnet
    from dana_tpu.models.layers import to_jnp

    b, h, w = 8, 608, 800
    config = dana.DanaConfig(compute_dtype=jnp.bfloat16)
    params = to_jnp(dana.init_params(config, seed=0))
    bp = params['backbone']
    cdt = config.compute_dtype
    im = jnp.zeros((b, h, w, 3), cdt)

    def stem(p, x):
        return resnet.stem(x, p)

    def l(name):
        def f(p, x):
            return resnet._layer(x, p[name],
                                 1 if name == 'layer1' else 2,
                                 resnet._bottleneck)
        return f

    x_stem = jax.jit(stem)(bp, im)
    x1 = jax.jit(l('layer1'))(bp, x_stem)
    x2 = jax.jit(l('layer2'))(bp, x1)

    stages = {
        'stem_conv7x7': (stem, (bp, im)),
        'layer1': (l('layer1'), (bp, x_stem)),
        'layer2': (l('layer2'), (bp, x1)),
        'layer3': (l('layer3'), (bp, x2)),
        'full_base': (
            lambda p, x: dana.backbone_base(p, config, x), (params, im)),
    }
    iters = int(os.environ.get('PROF_ITERS', '16'))
    for name, (fn, a) in stages.items():
        dt, flops = timed_device(fn, a, iters)
        mfu = flops / dt / V5E_BF16_PEAK if dt > 0 else 0.0
        print(f'{name:14s} {dt * 1e3:8.3f} ms  {flops / 1e9:8.2f} GFLOP  '
              f'MFU {100 * mfu:5.1f}%', flush=True)


if __name__ == '__main__':
    main()
