"""bs=1 serving latency on one v5e chip — the latency-sensitive counterpart
to bench.py's max-throughput batching numbers.

bench.py measures imgs/s at bs=8 (the throughput knee); a detection
service answering one query at a time cares about the time ONE request
occupies the device.  This tool measures the FULL device-side predict
(DAnA forward + box decode + NMS postprocess — the exact per-chunk step
inference.py dispatches, inference.py:173-177) at bs=1 on the standard
608x800 bucket, for the production serving variants:

  - cached-supports, bf16+f32head  (the AP-parity recipe, PERF.md)
  - cached-supports, int8 tail     (TPU.QUANT_INT8 PTQ path)
  - re-encoding supports per query (the reference's loop shape,
    /root/reference/inference.py:100 — it re-extracts support feats
    for every query image)

Two timings per variant, both immune to the remote-tunnel RTT:

  stream   ms/query when requests are back-to-back (lax.scan over K
           distinct staged queries inside ONE executable) — the
           steady-state device occupancy per request.
  request  ms for ONE dispatched executable, from differencing 1 vs 9
           async-pipelined calls (bench.py's probe) — adds the
           per-launch overhead a single isolated request pays.

Writes .scratch/latency_study.json and prints a table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from utils import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    from dana_tpu import quant
    from dana_tpu.data import blob as blob_lib
    from dana_tpu.engine.postprocess import postprocess_batch
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    h, w = 608, 800
    k = int(os.environ.get('LAT_ITERS', '32'))
    config = dana.DanaConfig(
        n_way=2, n_shot=3, compute_dtype=jnp.bfloat16,
        head_dtype=jnp.float32)
    params = to_jnp(dana.init_params(config, seed=0))

    im = jnp.asarray(blob_lib.s2d_pack(np.zeros((1, h, w, 3), np.float32)))
    sup = jnp.asarray(blob_lib.s2d_pack_any(
        np.zeros((1, config.n_shot, 320, 320, 3), np.float32)))
    info = jnp.array([[float(h), float(w), 1.0]])
    ims = jnp.stack([im + jnp.float32(i) for i in range(k)])

    sup_feats = dana.extract_support_feats(params, config, sup)
    qconfig = dataclasses.replace(config, roi_align_int8=True)
    qparams = to_jnp(quant.quantize_params(params, scope='tail'))
    qsup_feats = dana.extract_support_feats(qparams, qconfig, sup)

    def predict(cfg, p, one_im, feats):
        out = dana.forward(p, cfg, one_im, info, training=False,
                           support_feats=feats)
        dets, valid = postprocess_batch(
            out['rois'], out['cls_prob'], out['bbox_pred'], info)
        return dets.sum() + valid.sum()

    def predict_reenc(cfg, p, one_im, raw_sup):
        feats = dana.extract_support_feats(p, cfg, raw_sup)
        return predict(cfg, p, one_im, feats)

    variants = {
        'cached_bf16_f32head': jax.jit(
            lambda p, x: predict(config, p, x, sup_feats)),
        'cached_int8_tail': jax.jit(
            lambda p, x: predict(qconfig, p, x, qsup_feats)),
        'reencode_supports': jax.jit(
            lambda p, x: predict_reenc(config, p, x, sup)),
    }
    variant_params = {'cached_int8_tail': qparams}

    rows = {}
    for name, fn in variants.items():
        p = variant_params.get(name, params)

        # stream: K back-to-back queries inside one executable
        @jax.jit
        def stream(p, ims, _fn_name=name):
            def body(acc, one_im):
                return acc + fn(p, one_im), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), ims)
            return acc

        np.asarray(jax.device_get(stream(p, ims)))   # compile

        def timed(f, args, n_calls):
            t0 = time.perf_counter()
            outs = [f(*args) for _ in range(n_calls)]
            np.asarray(jax.device_get(outs[-1]))
            return time.perf_counter() - t0

        dt = max((timed(stream, (p, ims), 9)
                  - timed(stream, (p, ims), 1)) / 8.0, 1e-9)
        stream_ms = 1e3 * dt / k

        # request: one dispatched bs1 executable, launch overhead included
        np.asarray(jax.device_get(fn(p, im)))        # compile
        dt1 = max((timed(fn, (p, im), 9)
                   - timed(fn, (p, im), 1)) / 8.0, 1e-9)
        request_ms = 1e3 * dt1

        rows[name] = {'stream_ms_per_query': round(stream_ms, 3),
                      'request_ms': round(request_ms, 3)}
        print(f'{name:24s} stream {stream_ms:7.3f} ms/query   '
              f'request {request_ms:7.3f} ms', flush=True)

    out = {'bucket': [h, w], 'bs': 1, 'iters': k,
           'backend': jax.default_backend(), 'rows': rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.scratch', 'latency_study.json')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps({'wrote': path}))


if __name__ == '__main__':
    main()
