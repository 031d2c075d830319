"""Multi-chip scaling evidence beyond one-step correctness (VERDICT r2
item 8): wall-clock ratios on the N-virtual-device CPU mesh.

What CPU ratios CAN prove (all virtual devices share this box's single
physical core, so absolute numbers are meaningless):

  * equal-global-work check: a dp-N step on global batch B must cost
    about the same as a single-device step on batch B — the mesh path
    adds only the gradient all-reduce.  Accidental serialization
    (host loops per shard, resharding round-trips) would blow the ratio
    up well past ~2x.
  * dp vs dp x tp at the same global batch: whether the TP
    column-sharding of the wide head weights helps or hurts step time.
    On 1 physical core TP cannot *win* (same FLOPs + extra collectives);
    the check is that it stays within noise rather than collapsing.

Run (CI shapes):   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                   python tools/scaling_study.py
Results are recorded in PERF.md ("Multi-chip scaling evidence").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if 'XLA_FLAGS' not in os.environ:
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_platforms', 'cpu')

from dana_tpu.engine import optim, train
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp

CFG = dana.DanaConfig(n_way=2, n_shot=2, train_pre_nms=200,
                      train_post_nms=32, test_pre_nms=200,
                      test_post_nms=16, nms_cap=200, rois_per_image=16,
                      rpn_batchsize=32)


def _batch(b, hw=(64, 96)):
    h, w = hw
    k = jax.random.PRNGKey(0)
    return {
        'im_data': 0.1 * jax.random.normal(k, (b, h, w, 3)),
        'im_info': jnp.tile(jnp.array([[float(h), float(w), 1.0]]), (b, 1)),
        'gt_boxes': jnp.tile(
            jnp.array([[[10.0, 10.0, 50.0, 40.0, 1.0]] + [[0.0] * 5] * 2]),
            (b, 1, 1)),
        'support_ims': 0.1 * jax.random.normal(k, (b, 4, 224, 224, 3)),
    }


def _time_steps(step, state, batch, rng, iters):
    state, m = step(state, batch, rng)          # compile + warm
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    jax.block_until_ready(state.params)
    return (time.perf_counter() - t0) / iters


def main(iters=3):
    devs = jax.devices()
    n = len(devs)
    print(f'{n} devices ({devs[0].platform})')
    params = to_jnp(dana.init_params(CFG, seed=0))
    trainable = optim.trainable_mask(params)
    step = train.make_train_step(CFG, trainable)
    rng = jax.random.PRNGKey(0)
    B = min(8, n)
    batch = _batch(B)

    # single device, global batch B
    t_single = _time_steps(step, train.create_train_state(params, 1e-3),
                           batch, rng, iters)
    print(f'single-device  bs{B}:        {t_single * 1e3:9.1f} ms/step')

    # dp-N, same global batch
    mesh = train.make_mesh(devs[:B])
    st = train.replicate(train.create_train_state(params, 1e-3), mesh)
    t_dp = _time_steps(step, st, train.shard_batch(batch, mesh), rng,
                       iters)
    r_dp = t_dp / t_single
    print(f'dp{B}            bs{B}:        {t_dp * 1e3:9.1f} ms/step '
          f'({r_dp:.2f}x single — equal global work)')

    # dp x tp 2-D mesh, same global batch
    t_tp = r_tp = None
    if n >= 4:
        mesh2 = train.make_mesh_2d(devs[:B], data=B // 2, model=2)
        st2 = train.shard_state_tp(train.create_train_state(params, 1e-3),
                                   mesh2)
        t_tp = _time_steps(step, st2, train.shard_batch(batch, mesh2),
                           rng, iters)
        r_tp = t_tp / t_dp
        print(f'dp{B // 2}xtp2        bs{B}:        {t_tp * 1e3:9.1f} '
              f'ms/step ({r_tp:.2f}x dp-only)')

    ok = r_dp < 3.0
    print(f'serialization check (dp{B} <= 3x single at equal global '
          f'work): {"OK" if ok else "FAIL"}')
    return {'t_single': t_single, 't_dp': t_dp, 'r_dp': r_dp,
            't_tp': t_tp, 'r_tp': r_tp, 'ok': ok}


if __name__ == '__main__':
    main()
