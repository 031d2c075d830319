"""RoIAlign locality-blocking study (VERDICT r3 item 7, ROADMAP #3).

The production RoIAlign (ops/roi_align.py, combined path) contracts
every RoI's [P^2, HW] weight rows against ALL HW=1900 feature positions
— deliberate dense-matmul redundancy (~3-4 ms/batch at eval shapes).
The locality idea: a RoI's bilinear footprint only spans its own
extent, so blocking by spatial tile could skip most of the contraction.

This study answers it in three parts, on the real chip:

1. HEADROOM — the RoI-extent distribution at eval shapes: what fraction
   of the feature map does a post-NMS RoI actually touch?  That bounds
   any locality scheme's win (compute saved <= 1 - mean coverage).
2. CANDIDATES — time the existing formulations head-to-head:
   XLA combined (production), XLA separable, the self-contained Pallas
   kernel, and the precomputed-weights Pallas kernel
   (roi_align_pallas_pw) at roi_block in {8, 16, 32} — the pw kernel is
   itself a FLOP-locality play (separable stage contracts H=38, not
   HW=1900, with the [RB,P,W,C] tmp VMEM-resident).
3. VERDICT — a win gets wired, a loss gets the measured-negative
   writeup in PERF.md and the ROADMAP item closed.

RoI distributions: 'realistic' mixes small/medium/large boxes in the
proportion post-NMS proposals show on the synth checkpoint (~60/30/10),
'worst' is all full-image rois (zero locality headroom by construction).

Usage: python tools/roi_locality_study.py [--iters 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import utils as _cli_utils; _cli_utils.enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

B, H, W, C, R, P = 8, 38, 50, 1024, 300, 7
SCALE = 1.0 / 16.0
IMG_H, IMG_W = H * 16, W * 16


def make_rois(kind, seed=0):
    rng = np.random.default_rng(seed)
    if kind == 'worst':
        r = np.tile(np.array([[0.0, 0.0, IMG_W - 1.0, IMG_H - 1.0]],
                             np.float32), (B, R, 1))
        return jnp.asarray(r.reshape(B, R, 4))
    # realistic: post-NMS proposal mix — mostly small, some medium,
    # a few near-image-size
    sizes = np.concatenate([
        rng.uniform(16, 96, (int(R * 0.6), 2)),
        rng.uniform(96, 320, (int(R * 0.3), 2)),
        rng.uniform(320, 600, (R - int(R * 0.6) - int(R * 0.3), 2)),
    ])
    out = np.zeros((B, R, 4), np.float32)
    for b in range(B):
        rng.shuffle(sizes)
        xy = rng.uniform(0, [IMG_W - 16, IMG_H - 16], (R, 2))
        out[b, :, 0] = xy[:, 0]
        out[b, :, 1] = xy[:, 1]
        out[b, :, 2] = np.minimum(xy[:, 0] + sizes[:, 0], IMG_W - 1)
        out[b, :, 3] = np.minimum(xy[:, 1] + sizes[:, 1], IMG_H - 1)
    return jnp.asarray(out)


def extent_stats(rois):
    r = np.asarray(rois) * SCALE
    hy = np.maximum(r[..., 3] - r[..., 1], 1.0) + 1     # feat rows touched
    wx = np.maximum(r[..., 2] - r[..., 0], 1.0) + 1
    cover = (hy / H) * (wx / W)
    return {
        'mean_rows_frac': round(float((hy / H).mean()), 3),
        'mean_cols_frac': round(float((wx / W).mean()), 3),
        'mean_area_frac': round(float(cover.mean()), 3),
        'p90_area_frac': round(float(np.quantile(cover, 0.9)), 3),
    }


def timed(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    t1 = time.perf_counter()
    # subtract a 1-iter run to cancel dispatch overhead
    t2 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    t3 = time.perf_counter()
    return max((t1 - t0 - (t3 - t2)) / max(iters - 1, 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=64)
    args = ap.parse_args()

    from dana_tpu.ops.roi_align import roi_align
    from dana_tpu.ops.roi_align_pallas import (roi_align_pallas,
                                               roi_align_pallas_pw)

    key = jax.random.PRNGKey(0)
    feat = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)

    results = {}
    for kind in ('realistic', 'worst'):
        rois = make_rois(kind)
        rows = {'extent': extent_stats(rois)}

        cands = {
            'xla_combined': lambda f, r: roi_align(f, r, P),
            'pallas_selfcontained': lambda f, r: roi_align_pallas(
                f, r, P, roi_block=8),
        }
        for rb in (8, 16, 32):
            cands[f'pallas_pw_rb{rb}'] = (
                lambda f, r, rb=rb: roi_align_pallas_pw(
                    f, r, P, roi_block=rb))

        ref = np.asarray(roi_align(feat, rois, P), np.float32)
        for name, fn in cands.items():
            try:
                got = np.asarray(fn(feat, rois), np.float32)
                err = float(np.max(np.abs(got - ref)))
                dt = timed(fn, (feat, rois), args.iters)
                rows[name] = {'ms': round(dt * 1e3, 3),
                              'max_abs_err_vs_xla': round(err, 5)}
            except Exception as e:
                rows[name] = {'error': str(e)[:160]}
            print(kind, name, rows[name], flush=True)
        results[kind] = rows

    os.makedirs('/root/repo/.scratch', exist_ok=True)
    with open('/root/repo/.scratch/roi_locality_study.json', 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
