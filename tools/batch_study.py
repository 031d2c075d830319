"""Inference batch-scaling study (VERDICT r2 item 5a): why did bs16 only
buy +3% in round 2?

Measures, on the real TPU, imgs/s and per-img device time for
bs in {4, 8, 16, 32} on the 608x800 bucket, for (a) the full forward and
(b) the proposal-NMS stage alone — the standing hypothesis is the
batched NMS while_loop serializing under vmap (each batch row's fixpoint
runs its own iteration count; the lockstep upper bound is max over
rows).

Usage: python tools/batch_study.py [--iters 8]
Results recorded in PERF.md ("batch saturation").
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_attrib import timed_device, V5E_BF16_PEAK


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--batches', type=int, nargs='*',
                    default=[4, 8, 16, 32])
    args = ap.parse_args()

    from utils import enable_compilation_cache
    enable_compilation_cache()
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp
    from dana_tpu.ops import nms as nms_lib

    h, w = 608, 800
    config = dana.DanaConfig(n_way=2, n_shot=3,
                             compute_dtype=jnp.bfloat16)
    params = to_jnp(dana.init_params(config, seed=0))
    sup_feats_1 = dana.extract_support_feats(
        params, config, jnp.zeros((1, config.n_shot, 320, 320, 3)))

    print(f'{"bs":>4s} {"ms/batch":>10s} {"ms/img":>8s} {"imgs/s":>8s} '
          f'{"MFU":>6s}   (full forward, cached supports)')
    base_ms_img = None
    for bs in args.batches:
        im = jnp.zeros((bs, h, w, 3), jnp.float32)
        info = jnp.tile(jnp.array([[float(h), float(w), 1.0]]), (bs, 1))
        sup = tuple(jnp.tile(f, (bs,) + (1,) * (f.ndim - 1))
                    for f in sup_feats_1)

        def fwd(params, im, info, sup):
            out = dana.forward(params, config, im, info, training=False,
                               support_feats=sup)
            return out['rois'], out['cls_prob'], out['bbox_pred']

        dt, flops = timed_device(fwd, (params, im, info, sup), args.iters)
        mfu = flops / dt / V5E_BF16_PEAK
        ms_img = dt * 1e3 / bs
        if base_ms_img is None:
            base_ms_img = ms_img
        print(f'{bs:4d} {dt * 1e3:10.2f} {ms_img:8.2f} '
              f'{bs / dt:8.1f} {100 * mfu:5.1f}%  '
              f'({base_ms_img / ms_img:.2f}x vs bs{args.batches[0]})',
              flush=True)

    # isolate proposal NMS across batch sizes (6000 -> 300 test shape)
    print('\nproposal-NMS stage alone (6000 boxes -> keep 300):')
    rng = jax.random.PRNGKey(0)
    for bs in args.batches:
        boxes = jax.random.uniform(rng, (bs, 6000, 4)) * 600.0
        boxes = jnp.concatenate([boxes[..., :2],
                                 boxes[..., :2] + boxes[..., 2:] + 16.0],
                                axis=-1)
        scores = jax.random.uniform(rng, (bs, 6000))

        def run_nms(boxes, scores):
            return jax.vmap(lambda b, s: nms_lib.nms_fixed_tiled(
                b, s, 0.7, 300))(boxes, scores)

        dt, _ = timed_device(run_nms, (boxes, scores), args.iters)
        print(f'{bs:4d} {dt * 1e3:10.2f} ms/batch '
              f'{dt * 1e3 / bs:8.3f} ms/img', flush=True)


if __name__ == '__main__':
    main()
