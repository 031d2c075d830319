"""Multi-process distributed train-step check harness.

Proves the multi-host execution path (dana_tpu.parallel.distributed):
N processes x M local CPU devices, gloo collectives, coordinator on
localhost — each process materializes only its row block of a
deterministic global batch, assembles global arrays via
make_array_from_process_local_data (shard_batch's multi-process
dispatch), and runs ONE jitted DP train step over the global mesh.
Rank 0 writes the loss metrics + updated-param fingerprint as JSON;
tests/test_distributed.py asserts a 2x4 pair reproduces the 1x8
single-process step exactly (equal global batch, equal updates).

Single mode:  python tools/dist_train_check.py --procs 1 \
                  --local_devices 8 --out single.json
Pair mode:    ... --procs 2 --rank {0,1} --coordinator localhost:PORT \
                  --local_devices 4 --out rank0.json
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--procs', type=int, default=1)
    ap.add_argument('--rank', type=int, default=0)
    ap.add_argument('--coordinator', default='localhost:29801')
    ap.add_argument('--local_devices', type=int, default=4)
    ap.add_argument('--out', default=None)
    args = ap.parse_args(argv)

    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count='
            f'{args.local_devices}').strip()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    try:      # share the test suite's persistent compile cache
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax_dana_tests'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
    except Exception:
        pass
    if args.procs > 1:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        from dana_tpu.parallel.distributed import init_distributed
        init_distributed(args.coordinator, args.procs, args.rank)
    assert len(jax.devices()) == 8, (
        f'harness expects 8 global devices, got {len(jax.devices())}')

    import jax.numpy as jnp
    import numpy as np
    from dana_tpu.engine import optim, train as train_engine
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp
    from dana_tpu.parallel.distributed import local_rows

    cfg = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=200,
                          train_post_nms=32, nms_cap=200,
                          rois_per_image=16, rpn_batchsize=32)
    gbs = 8
    # deterministic per-GLOBAL-ROW content so a data-slicing bug (wrong
    # rows, wrong order, duplicated slice) changes the losses
    rows = np.arange(gbs, dtype=np.float32)[:, None, None, None]
    batch = {
        'im_data': np.broadcast_to(
            0.1 * rows, (gbs, 128, 160, 3)).astype(np.float32).copy(),
        'im_info': np.tile(np.array([[128.0, 160.0, 1.0]], np.float32),
                           (gbs, 1)),
        'gt_boxes': np.stack([
            np.array([[10.0 + 3 * r, 10.0, 100.0, 90.0 + r, 1.0]]
                     + [[0.0] * 5] * 2, np.float32)
            for r in range(gbs)]),
        'support_ims': np.broadcast_to(
            0.05 * rows[:, None],
            (gbs, 2, 320, 320, 3)).astype(np.float32).copy(),
    }
    if args.procs > 1:
        sl = local_rows(gbs)
        batch = {k: v[sl] for k, v in batch.items()}

    params = to_jnp(dana.init_params(cfg, seed=0))
    trainable = optim.trainable_mask(params)
    step = train_engine.make_train_step(cfg, trainable)
    mesh = train_engine.make_mesh()
    state = train_engine.replicate(
        train_engine.create_train_state(params, 1e-3), mesh)
    sharded = train_engine.shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    # AOT-compile BEFORE the coordination barrier: compile time differs
    # across ranks (cold vs warm persistent cache), and the CPU gloo
    # context init that the first collective triggers has a fixed 30s
    # key-exchange timeout — ranks must enter it near-simultaneously
    compiled = step.lower(state, sharded, key).compile()
    from dana_tpu.parallel.distributed import barrier
    barrier('dist_check_compiled')
    new_state, metrics = compiled(state, sharded, key)
    jax.block_until_ready(new_state.params)

    if args.procs > 1:
        # the preemption stop-vote (train.py stop_requested): a flag set
        # on ONE rank must come back True on EVERY rank, and a quiet
        # round must come back False — both ranks assert, so a vote bug
        # fails the harness with a nonzero exit
        from dana_tpu.parallel.distributed import agree_stop
        assert agree_stop(jax.process_index() == 1) is True, \
            'one-rank preempt flag did not propagate'
        assert agree_stop(False) is False, 'phantom stop vote'

    if jax.process_index() == 0 and args.out:
        fp = jax.tree.reduce(
            lambda a, x: a + float(jnp.abs(x).sum()),
            jax.device_get(new_state.params), 0.0)
        payload = {
            'procs': args.procs,
            'metrics': {k: float(v) for k, v in metrics.items()},
            'param_abs_sum': fp,
        }
        with open(args.out, 'w') as f:
            json.dump(payload, f)
        print('WROTE', args.out, payload, flush=True)


if __name__ == '__main__':
    main()
