"""Host-side data-pipeline benchmark: native C++ kernels vs numpy.

Measures the per-image eval query path (imread -> mean-sub -> resize ->
canvas pad -> s2d pack) and the per-episode train path (query + way*shot
support decode) on the synthetic dataset, with the native host kernels
(native/host_ops.cpp) on and off (DANA_NO_NATIVE).  The numbers behind
PERF.md "native host image-prep kernels".

Usage: python tools/host_prep_bench.py [n_items]
"""

import os
import sys
import time

sys.path.insert(0, '/root/repo')

import jax

jax.config.update('jax_platforms', 'cpu')     # host-only benchmark

import numpy as np  # noqa: E402


def bench_eval(roidb, pool, n, pack_s2d=True):
    from dana_tpu.data.inference_loader import InferenceLoader
    loader = InferenceLoader(roidb, pool, pack_s2d=pack_s2d)
    loader[0]                                  # warm file cache
    t0 = time.perf_counter()
    for i in range(n):
        loader[i % len(roidb)]
    return (time.perf_counter() - t0) / n


def bench_train(roidb, num_classes, n):
    from dana_tpu.data.fs_loader import FewShotLoader
    loader = FewShotLoader(roidb, num_classes, num_way=2, num_shot=3,
                           seed=7)
    loader[0]
    t0 = time.perf_counter()
    for i in range(n):
        loader[i % len(roidb)]
    return (time.perf_counter() - t0) / n


def main(n=48):
    from dana_tpu.data.imdb import combined_roidb
    from dana_tpu.data.inference_loader import SupportPool

    imdb, roidb, _, _ = combined_roidb('synth_test', training=False,
                                       use_flipped=False)
    imdb_t, roidb_t, _, _ = combined_roidb('synth_train', training=True,
                                           use_flipped=False)
    pool = SupportPool(imdb.classes, 2, support_roidb=roidb_t, seed=0)

    rows = []
    for native in (True, False):
        if native:
            os.environ.pop('DANA_NO_NATIVE', None)
        else:
            os.environ['DANA_NO_NATIVE'] = '1'
        ev = bench_eval(roidb, pool, n)
        tr = bench_train(roidb_t, imdb_t.num_classes, n)
        rows.append((native, ev, tr))
        print(f'native={native}: eval query {ev * 1e3:.1f} ms/img '
              f'({1 / ev:.0f} img/s host), train episode '
              f'{tr * 1e3:.1f} ms/ep', flush=True)
    os.environ.pop('DANA_NO_NATIVE', None)
    (_, ev_n, tr_n), (_, ev_np, tr_np) = rows
    print(f'speedup: eval {ev_np / ev_n:.2f}x, train {tr_np / tr_n:.2f}x')
    return rows


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 48)
