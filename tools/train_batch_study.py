"""Train-step batch-scaling x remat study (VERDICT r3 item 6).

Measures episodes/s and train-step MFU at the reference episode
geometry (608x1024 queries, 2-way 3-shot 320px supports) for
bs in {4, 8, 16, 32} with REMAT_BACKBONE off and on, using the
PRODUCTION step semantics: frozen-leaf stop_gradient cut (the r3
frozen-grad DCE), SGD+momentum update, bf16+f32-head precision recipe.

The reference protocol is bs=4 (reference README.md:127); everything
above it is the TPU-native "how fast can this chip actually train"
question.  OOMs are recorded as results, not crashes.

Usage: python tools/train_batch_study.py [--batches 4 8 16 32]
Results recorded in PERF.md ("train batch scaling x remat").
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

V5E_BF16_PEAK = 394e12


def measure(bs, remat):
    from dana_tpu.engine import optim, train as te
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    config = dana.DanaConfig(n_way=2, n_shot=3,
                             compute_dtype=jnp.bfloat16,
                             head_dtype=jnp.float32,
                             remat_backbone=remat)
    params = to_jnp(dana.init_params(config, seed=0))
    trainable = optim.trainable_mask(params)
    state = te.create_train_state(params, 1e-3)
    step = te.make_train_step(config, trainable)

    key = jax.random.PRNGKey(0)
    batch = {
        'im_data': jax.random.normal(key, (bs, 608, 1024, 3)) * 50,
        'im_info': jnp.tile(jnp.array([[600.0, 1000.0, 1.0]]), (bs, 1)),
        'gt_boxes': jnp.tile(
            jnp.array([[[50.0, 50.0, 400.0, 300.0, 1.0]]
                       + [[0.0] * 5] * 19]), (bs, 1, 1)),
        'support_ims': jax.random.normal(
            key, (bs, 6, 320, 320, 3)) * 50,
    }
    batch = jax.device_put(batch)

    lowered = step.lower(state, batch, key)
    compiled = lowered.compile()
    try:
        flops = (compiled.cost_analysis() or {}).get('flops', 0.0)
    except Exception:
        flops = 0.0

    def _force(st):
        np.asarray(jax.device_get(st.step))
        np.asarray(jax.device_get(jax.tree.leaves(st.params)[0]))

    st, _ = compiled(state, batch, key)      # warmup
    _force(st)

    def run(n):
        nonlocal st
        t0 = time.perf_counter()
        for i in range(n):
            st, _ = compiled(st, batch, jax.random.PRNGKey(2 + i))
        _force(st)
        return time.perf_counter() - t0

    # difference pipelined timings to cancel tunnel dispatch latency
    n_steps = max(4, 64 // bs)
    t1 = run(1)
    tn = run(n_steps)
    dt = max((tn - t1) / (n_steps - 1), 1e-6)
    return {
        'bs': bs, 'remat': remat,
        'ms_per_step': round(dt * 1e3, 2),
        'episodes_per_sec': round(bs / dt, 2),
        'mfu_pct': round(100 * flops / dt / V5E_BF16_PEAK, 2),
        'gflop_per_step': round(flops / 1e9, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='*',
                    default=[4, 8, 16, 32])
    args = ap.parse_args()

    rows = []
    for remat in (False, True):
        for bs in args.batches:
            try:
                r = measure(bs, remat)
            except Exception as e:
                msg = str(e)
                kind = 'OOM' if 'RESOURCE_EXHAUSTED' in msg \
                    or 'Out of memory' in msg else 'ERROR'
                r = {'bs': bs, 'remat': remat, 'error': kind,
                     'detail': msg[:200]}
            rows.append(r)
            print(json.dumps(r), flush=True)
    os.makedirs('/root/repo/.scratch', exist_ok=True)
    with open('/root/repo/.scratch/train_batch_study.json', 'w') as f:
        json.dump(rows, f, indent=1)


if __name__ == '__main__':
    main()
