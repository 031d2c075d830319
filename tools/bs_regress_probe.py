"""Why do bs16/32 REGRESS in absolute episodes/s? (PERF.md round-4
batch-scaling study left the cause as a hypothesis: "likely a worse XLA
schedule under memory pressure".)

Two decisive probes per batch size, reference episode geometry
(608x1024 queries, 2-way 3-shot 320px supports), production step
semantics (frozen-grad DCE, bf16+f32head):

1. **Forward/backward decomposition**: time forward-only and the full
   step separately.  If the forward scales linearly but the backward's
   per-episode cost grows past bs8, the regression lives in the
   backward schedule (where the activation footprint bites); if both
   degrade, it's a general scheduling effect.
2. **XLA memory analysis**: compiled.memory_analysis() temp/argument/
   output bytes per executable.  Temp bytes approaching the v5e's
   16 GB HBM is direct evidence of memory pressure (XLA serializes
   fusions / spills when the buffer graph gets tight).

Usage (TPU): python tools/bs_regress_probe.py [--batches 8 16 32]
CPU smoke:   PROF_DRY=1 python tools/bs_regress_probe.py
Results recorded in PERF.md (round-4 batch-scaling study, cause).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
if int(os.environ.get('PROF_DRY', '0')):
    # The axon sitecustomize overrides JAX_PLATFORMS env vars; only the
    # in-process config update actually forces CPU (tests/conftest.py).
    jax.config.update('jax_platforms', 'cpu')
import utils as _cli_utils; _cli_utils.enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 394e12


def make_batch(bs, h, w, sup):
    key = jax.random.PRNGKey(0)
    return jax.device_put({
        'im_data': jax.random.normal(key, (bs, h, w, 3)) * 50,
        'im_info': jnp.tile(jnp.array([[float(h) - 8, float(w) - 24, 1.0]]),
                            (bs, 1)),
        'gt_boxes': jnp.tile(
            jnp.array([[[50.0, 50.0, 400.0, 300.0, 1.0]]
                       + [[0.0] * 5] * 19]), (bs, 1, 1)),
        'support_ims': jax.random.normal(key, (bs, 6, sup, sup, 3)) * 50,
    })


def mem_info(compiled):
    try:
        m = compiled.memory_analysis()
        return {'temp_mb': round(m.temp_size_in_bytes / 2**20, 1),
                'arg_mb': round(m.argument_size_in_bytes / 2**20, 1),
                'out_mb': round(m.output_size_in_bytes / 2**20, 1),
                'gen_mb': round(m.generated_code_size_in_bytes / 2**20, 1)}
    except Exception as e:
        return {'mem_error': str(e)[:120]}


def timed(compiled, args0, n, refresh, force):
    """Pipelined difference timing (cancels tunnel dispatch RTT).
    `refresh(i, a, out)` must thread the output back in so successive
    calls form a dependency chain; `force(out)` must device_get a leaf
    — through the axon tunnel block_until_ready is NOT a reliable
    barrier, only a host transfer is (train_batch_study._force)."""
    out = compiled(*args0)
    force(out)

    def run(k):
        nonlocal out
        a = args0
        t0 = time.perf_counter()
        for i in range(k):
            a = refresh(i, a, out)
            out = compiled(*a)
        force(out)
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(n)
    return max((tn - t1) / (n - 1), 1e-6)


def probe(bs, dry=False):
    from dana_tpu.engine import optim, train as te
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    h, w, sup = (128, 160, 224) if dry else (608, 1024, 320)
    config = dana.DanaConfig(n_way=2, n_shot=3,
                             compute_dtype=jnp.bfloat16,
                             head_dtype=jnp.float32)
    params = to_jnp(dana.init_params(config, seed=0))
    trainable = optim.trainable_mask(params)
    state = te.create_train_state(params, 1e-3)
    step = te.make_train_step(config, trainable)
    batch = make_batch(bs, h, w, sup)
    rng = jax.random.PRNGKey(1)

    # forward-only, with the SAME stop_gradient cut as the production
    # step so the two executables share the frozen-trunk structure
    def fwd(params, batch, rng):
        def loss_of(p):
            p = jax.tree.map(
                lambda x, t: x if t else jax.lax.stop_gradient(x),
                p, trainable)
            return te.loss_fn(p, config, batch, rng)
        loss, _ = loss_of(params)
        return loss

    n = 2 if dry else max(4, 64 // bs)

    fwd_c = jax.jit(fwd).lower(params, batch, rng).compile()
    fwd_flops = (fwd_c.cost_analysis() or {}).get('flops', 0.0)
    fwd_dt = timed(
        fwd_c, (params, batch, rng), n,
        # perturb the rng so successive calls can't be hoisted/cached
        lambda i, a, out: (a[0], a[1], jax.random.PRNGKey(3 + i)),
        lambda out: np.asarray(jax.device_get(out)))

    step_c = step.lower(state, batch, rng).compile()
    step_flops = (step_c.cost_analysis() or {}).get('flops', 0.0)
    step_dt = timed(
        step_c, (state, batch, rng), n,
        lambda i, a, out: (out[0], a[1], jax.random.PRNGKey(3 + i)),
        lambda out: np.asarray(jax.device_get(out[1]['loss'])))

    row = {
        'bs': bs,
        'fwd_ms': round(fwd_dt * 1e3, 2),
        'fwd_ms_per_ep': round(fwd_dt * 1e3 / bs, 3),
        'fwd_mfu_pct': round(100 * fwd_flops / fwd_dt / V5E_BF16_PEAK, 2),
        'step_ms': round(step_dt * 1e3, 2),
        'step_ms_per_ep': round(step_dt * 1e3 / bs, 3),
        'bwd_ms_per_ep': round((step_dt - fwd_dt) * 1e3 / bs, 3),
        'step_mfu_pct': round(100 * step_flops / step_dt / V5E_BF16_PEAK, 2),
        'fwd_mem': mem_info(fwd_c),
        'step_mem': mem_info(step_c),
    }
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='*', default=[4, 8, 16, 32])
    args = ap.parse_args()
    dry = bool(int(os.environ.get('PROF_DRY', '0')))

    rows = []
    for bs in args.batches:
        row = probe(bs, dry=dry)
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs('/root/repo/.scratch', exist_ok=True)
    with open('/root/repo/.scratch/bs_regress_probe.json', 'w') as f:
        json.dump(rows, f, indent=1)


if __name__ == '__main__':
    main()
