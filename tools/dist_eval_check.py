"""Multi-process distributed EVAL check harness.

Proves inference.py's --dist path (the multi-host serving story): N
processes x M local CPU devices, each rank running an independent
local-device mesh over a disjoint strided chunk split, per-rank partial
detections merged by the chief behind a coordination-service barrier.
No device collectives are involved — eval is embarrassingly parallel —
so the pair needs only the jax.distributed KV store, not gloo.

tests/test_distributed.py asserts a 2x4 pair's merged detections.pkl
matches a 1x8 single-process --mGPUs run on the same synthetic split
(up to equal-score tie permutation, see
tests/test_inference_cli._assert_detections_match).

Rank mode: python tools/dist_eval_check.py --rank {0,1} --procs 2 \
               --coordinator localhost:PORT --eval_dir DIR --bs 4
(DANA_SYNTH_ROOT must point at the pre-generated synthetic dataset.)
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# keep in sync with tests/test_inference_cli.BASE_ARGS so the pair
# reuses the suite's persistent compile cache
BASE_ARGS = [
    '--dataset', 'synth', '--net', 'DAnA', '--backbone', 'res50',
    '--way', '1', '--shot', '1', '--seed', '5',
    '--set',
    'TEST.SCALES', '(128,)', 'TEST.MAX_SIZE', '192',
    'TEST.RPN_PRE_NMS_TOP_N', '300', 'TEST.RPN_POST_NMS_TOP_N', '32',
    'TPU.NMS_MAX_INPUT', '300',
    'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--rank', type=int, required=True)
    ap.add_argument('--procs', type=int, default=2)
    ap.add_argument('--coordinator', required=True)
    ap.add_argument('--eval_dir', required=True)
    ap.add_argument('--bs', default='4')
    ap.add_argument('--local_devices', type=int, default=4)
    args = ap.parse_args(argv)

    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count='
            f'{args.local_devices}').strip()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax_dana_tests'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
    except Exception:
        pass

    import inference
    inference.main(BASE_ARGS + [
        '--bs', args.bs, '--eval_dir', args.eval_dir, '--mGPUs',
        '--dist', '--coordinator', args.coordinator,
        '--num_procs', str(args.procs), '--proc_id', str(args.rank)])


if __name__ == '__main__':
    main()
