"""Benchmark: DAnA query-image inference throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference eval protocol (inference.py:85-105: ResNet-50
DAnA, 3-shot supports at 320x320, shortest-side-600 query) but batched —
the reference runs bs=1 on GPU; its published per-image timing prints put
it around ~4-5 img/s on a 2080 Ti-class GPU (no official number exists:
BASELINE.md — baseline taken as 5 img/s; vs_baseline is ours/5, and the
JSON carries "baseline_assumed": true so nobody mistakes it for a
measured GPU comparison — MFU is the defensible absolute number).

Weights are random-init (SkipInit zeros the residual branches, so
activations are numerically degenerate) — XLA does not exploit value
sparsity, every conv/matmul executes identical work regardless of weight
values, so the timings are valid throughput measurements; only the box
CONTENT is meaningless here, and nothing downstream reads it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 5.0

# Every reported number is the MEDIAN of this many independent
# differenced measurements, with [min, max] spread recorded next to it
# (VERDICT r4: a single-shot bench swung -24% with no code change).
REPEATS = max(1, int(os.environ.get('BENCH_REPEATS', '5')))


def _measure_rate(timed, work, calls=(1, 9), repeats=None):
    """Repeat the differenced timing; return (median rate, (min, max)).

    timed(n) runs n async-pipelined calls of one compiled executable and
    blocks on the last; (timed(m) - timed(1)) / (m - 1) is pure device
    time per call, free of the tunnel's per-dispatch RTT.  `work` is the
    number of work units (images / episodes) per call."""
    rates = []
    for _ in range(repeats or REPEATS):
        t1 = timed(calls[0])
        tm = timed(calls[1])
        dt = max((tm - t1) / (calls[1] - calls[0]), 1e-6)
        rates.append(work / dt)
    rates.sort()
    n = len(rates)
    med = rates[n // 2] if n % 2 else 0.5 * (rates[n // 2 - 1]
                                             + rates[n // 2])
    return med, (rates[0], rates[-1])


def main():
    from utils import enable_compilation_cache
    enable_compilation_cache()   # tunnel compiles are minutes; cache them
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    batch = int(os.environ.get('BENCH_BATCH', '8'))
    h, w = 608, 800
    # the AP-parity serving recipe: bf16 trunk + f32 head island (pure
    # bf16 drops synth AP 0.175->0.119; the f32 head recovers it exactly
    # at +4.7% forward cost — PERF.md "bf16 compute and AP").  BENCH
    # numbers are therefore quoted at full model quality.
    config = dana.DanaConfig(
        n_way=2, n_shot=3, compute_dtype=jnp.bfloat16,
        head_dtype=jnp.float32)
    params = to_jnp(dana.init_params(config, seed=0))

    import numpy as np

    # host-packed space-to-depth stem input (blob.s2d_pack): pre-staged
    # like every other input — bench measures pure device throughput; the
    # ~12 ms/img numpy pack is host preprocessing absorbed by the loader
    # pipeline exactly like mean-sub/resize (set BENCH_S2D=0 for the
    # direct 3-channel stem)
    use_s2d = os.environ.get('BENCH_S2D', '1') == '1'
    from dana_tpu.data import blob as blob_lib
    if use_s2d:
        im = jnp.asarray(blob_lib.s2d_pack(
            np.zeros((batch, h, w, 3), np.float32)))
        sup = jnp.asarray(blob_lib.s2d_pack_any(
            np.zeros((batch, config.n_shot, 320, 320, 3), np.float32)))
    else:
        im = jnp.zeros((batch, h, w, 3), jnp.float32)
        sup = jnp.zeros((batch, config.n_shot, 320, 320, 3), jnp.float32)
    info = jnp.tile(jnp.array([[float(h), float(w), 1.0]]), (batch, 1))

    iters = int(os.environ.get('BENCH_ITERS', '10'))

    # All timed iterations run inside ONE jit as a lax.scan over distinct
    # pre-staged inputs: measures pure device throughput, immune to the
    # per-dispatch latency of the remote-TPU tunnel (which otherwise
    # dominates and under-reports by ~6x).
    ims = jnp.stack([im + jnp.float32(i) for i in range(iters)])

    @jax.jit
    def predict_many(params, ims, info, sup):
        def body(acc, one_im):
            out = dana.forward(params, config, one_im, info, sup,
                               training=False)
            return acc + out['rois'].sum() + out['cls_prob'].sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), ims)
        return acc

    # warmup / compile; device_get forces completion
    np.asarray(jax.device_get(predict_many(params, ims, info, sup)))

    # Differencing removes the constant dispatch/transport latency (the
    # remote-TPU tunnel adds ~100s of ms of RTT per synchronization that
    # is NOT device time): time 1 call, then M async-pipelined calls of
    # the same executable; the delta is (M-1) x pure device time.
    def timed(n_calls):
        t0 = time.perf_counter()
        outs = [predict_many(params, ims, info, sup)
                for _ in range(n_calls)]
        np.asarray(jax.device_get(outs[-1]))
        return time.perf_counter() - t0

    # 1 vs 9 pipelined calls: 8 differenced steps halve the impact of
    # tunnel RTT jitter (with 4 steps a single slow t1 once produced a
    # negative delta and a nonsense throughput).  Each differenced
    # measurement is repeated BENCH_REPEATS times and the MEDIAN is the
    # reported number, with min/max spread fields in the JSON — a single
    # shot swung -24% round-over-round with zero device-code change
    # (BENCH_r04 vs r03), so unrepeated numbers cannot adjudicate
    # optimizations (VERDICT r4 item 1).
    imgs_per_sec, imgs_minmax = _measure_rate(timed, batch * iters)

    # cached-supports variant: the eval protocol fixes each class's
    # support set (seeded pool, inference_loader.py), so inference.py
    # encodes supports once per class and reuses the features for every
    # query — this measures that deployed path (the conservative
    # headline `value` still re-encodes per batch like the reference
    # loop does, inference.py:100)
    sup_feats = dana.extract_support_feats(params, config, sup)

    @jax.jit
    def predict_many_cached(params, ims, info, sup_feats):
        def body(acc, one_im):
            out = dana.forward(params, config, one_im, info,
                               training=False, support_feats=sup_feats)
            return acc + out['rois'].sum() + out['cls_prob'].sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), ims)
        return acc

    np.asarray(jax.device_get(
        predict_many_cached(params, ims, info, sup_feats)))

    def timed_cached(n_calls):
        t0 = time.perf_counter()
        outs = [predict_many_cached(params, ims, info, sup_feats)
                for _ in range(n_calls)]
        np.asarray(jax.device_get(outs[-1]))
        return time.perf_counter() - t0

    imgs_per_sec_cached, cached_minmax = _measure_rate(
        timed_cached, batch * iters)
    # Physical invariant: the cached path skips the support backbone, so
    # it must be at least as fast as re-encoding.  BENCH_r04 violated
    # this (348.7 < 368.7) from unrepeated measurement noise; if the
    # MEDIANS still cross, re-measure both once at double the repeats
    # before accepting the result.
    inference_repeats = REPEATS
    if imgs_per_sec_cached < imgs_per_sec:
        inference_repeats = 2 * REPEATS
        imgs_per_sec, imgs_minmax = _measure_rate(
            timed, batch * iters, repeats=inference_repeats)
        imgs_per_sec_cached, cached_minmax = _measure_rate(
            timed_cached, batch * iters, repeats=inference_repeats)
    # surfaced in the JSON so a reader can tell the protocol deviated
    # and whether the physically-impossible ordering survived it
    invariant_violated = bool(imgs_per_sec_cached < imgs_per_sec)

    # int8-quantized serving variant (dana_tpu/quant.py): PTQ of the
    # MXU-bound RoI tail + int8 RoIAlign matmul — the production
    # TPU.QUANT_INT8 path (AP parity: PERF.md r3).  Extra metric only;
    # the headline stays the bit-exact bf16 parity path.
    import dataclasses
    from dana_tpu import quant
    qconfig = dataclasses.replace(config, roi_align_int8=True)
    qparams = to_jnp(quant.quantize_params(params, scope='tail'))
    qsup_feats = dana.extract_support_feats(qparams, qconfig, sup)

    @jax.jit
    def predict_many_q(params, ims, info, sup_feats):
        def body(acc, one_im):
            out = dana.forward(params, qconfig, one_im, info,
                               training=False, support_feats=sup_feats)
            return acc + out['rois'].sum() + out['cls_prob'].sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), ims)
        return acc

    np.asarray(jax.device_get(
        predict_many_q(qparams, ims, info, qsup_feats)))

    def timed_q(n_calls):
        t0 = time.perf_counter()
        outs = [predict_many_q(qparams, ims, info, qsup_feats)
                for _ in range(n_calls)]
        np.asarray(jax.device_get(outs[-1]))
        return time.perf_counter() - t0

    imgs_per_sec_int8, int8_minmax = _measure_rate(timed_q, batch * iters)

    # FLOP-based MFU from XLA's own cost analysis of the compiled step
    # (VERDICT r1 item 3: report MFU next to imgs/s), against the v5e
    # bf16 peak.  cost_analysis counts the whole scan: divide by iters.
    v5e_peak = 394e12

    def one_batch(params, im, info, sup):
        out = dana.forward(params, config, im, info, sup, training=False)
        return out['rois'], out['cls_prob'], out['bbox_pred']

    try:
        cost = jax.jit(one_batch).lower(
            params, im, info, sup).compile().cost_analysis()
        flops_per_batch = float((cost or {}).get('flops', 0.0))
    except Exception:
        flops_per_batch = 0.0
    # iters/dt == imgs_per_sec / batch (median-based)
    mfu = flops_per_batch * imgs_per_sec / batch / v5e_peak

    # training throughput on the same chip (reference config shape:
    # 2-way 3-shot episodes, README.md:127), scan-staged like the
    # training CLI's --steps_per_call path
    train_metrics = _bench_train(
        config, params,
        batch=int(os.environ.get('BENCH_TRAIN_BATCH', '4')), steps=8)
    # throughput-optimal batch alongside the reference bs=4 protocol:
    # the batch-scaling study (PERF.md round 4, tools/train_batch_study)
    # put the knee at bs8 (+16% episodes/s; bs16/32 regress)
    bs_opt = int(os.environ.get('BENCH_TRAIN_BATCH_OPT', '8'))
    opt_metrics = _bench_train(config, params, batch=bs_opt, steps=4)
    train_metrics[f'train_episodes_per_sec_bs{bs_opt}'] = \
        opt_metrics['train_episodes_per_sec_per_chip']
    train_metrics[f'train_episodes_bs{bs_opt}_minmax'] = \
        opt_metrics['train_episodes_minmax']
    train_metrics[f'train_step_mfu_bs{bs_opt}_pct'] = \
        opt_metrics['train_step_mfu_pct']

    def _mm(pair):
        return [round(pair[0], 3), round(pair[1], 3)]

    out = {
        'metric': 'dana_r50_2way3shot_query_imgs_per_sec_per_chip',
        'value': round(imgs_per_sec, 3),
        'unit': 'imgs/s',
        'vs_baseline': round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
        'baseline_assumed': True,   # no published reference number exists
        # (BASELINE.md): denominator is an assumed 5 img/s GPU loop
        'precision': 'bf16+f32head',  # AP-parity serving recipe (PERF.md)
        'bench_repeats': REPEATS,   # every number = median of this many
        # inference pair re-measured at 2x repeats when cached < uncached
        'inference_repeats': inference_repeats,
        'cached_invariant_violated': invariant_violated,
        'value_minmax': _mm(imgs_minmax),
        'inference_mfu_pct': round(100 * mfu, 2),
        'inference_gflop_per_img': round(
            flops_per_batch / batch / 1e9, 1),
        'imgs_per_sec_cached_supports': round(imgs_per_sec_cached, 3),
        'cached_supports_minmax': _mm(cached_minmax),
        'imgs_per_sec_int8_serve': round(imgs_per_sec_int8, 3),
        'int8_serve_minmax': _mm(int8_minmax),
    }
    out.update(train_metrics)
    print(json.dumps(out))


def _bench_train(config, params, batch: int, steps: int):
    """Train-step throughput: episodes/s/chip + step MFU."""
    import numpy as np
    from dana_tpu.engine import optim, train
    from dana_tpu.models import dana as dana_lib

    tcfg = dana_lib.DanaConfig(
        n_way=config.n_way, n_shot=config.n_shot,
        compute_dtype=config.compute_dtype,
        head_dtype=config.head_dtype,
        # default honors the reference's full 12000 TRAIN pre-NMS
        # (PERF.md r3 nms_cap study); override to quantify the cap cost
        nms_cap=int(os.environ.get('BENCH_NMS_CAP', '12000')))
    trainable = optim.trainable_mask(params)
    multi = train.make_multi_train_step(tcfg, trainable)
    h, w = 608, 800
    k = jax.random.PRNGKey(0)
    use_s2d = os.environ.get('BENCH_S2D', '1') == '1'
    from dana_tpu.data import blob as blob_lib
    if use_s2d:
        im_data = jnp.asarray(blob_lib.s2d_pack_any(
            np.zeros((steps, batch, h, w, 3), np.float32)))
        sup = jnp.asarray(blob_lib.s2d_pack_any(np.zeros(
            (steps, batch, tcfg.n_way * tcfg.n_shot, 320, 320, 3),
            np.float32)))
    else:
        im_data = jnp.zeros((steps, batch, h, w, 3), jnp.float32)
        sup = jnp.zeros(
            (steps, batch, tcfg.n_way * tcfg.n_shot, 320, 320, 3),
            jnp.float32)
    batches = {
        'im_data': im_data,
        'im_info': jnp.tile(jnp.array([[float(h), float(w), 1.0]]),
                            (steps, batch, 1)),
        'gt_boxes': jnp.tile(
            jnp.array([[[50.0, 50.0, 300.0, 260.0, 1.0]] + [[0.0] * 5] * 19]),
            (steps, batch, 1, 1)),
        'support_ims': sup,
    }
    state = train.create_train_state(params, 1e-3)

    new_state, _ = multi(state, batches, k)   # warmup/compile
    jax.block_until_ready(new_state.params)

    def run(n):
        t0 = time.perf_counter()
        st = state
        for _ in range(n):
            st, _ = multi(st, batches, k)
        jax.block_until_ready(st.params)
        return time.perf_counter() - t0

    eps_per_sec, eps_minmax = _measure_rate(run, steps * batch,
                                            calls=(1, 3))
    try:
        single = train.make_train_step(tcfg, trainable)
        one = jax.tree.map(lambda x: x[0], batches)
        cost = jax.jit(single).lower(state, one, k).compile() \
            .cost_analysis()
        train_flops = float((cost or {}).get('flops', 0.0))
    except Exception:
        train_flops = 0.0
    # steps/dt == eps_per_sec / batch (median-based)
    return {
        'train_episodes_per_sec_per_chip': round(eps_per_sec, 2),
        'train_episodes_minmax': [round(eps_minmax[0], 2),
                                  round(eps_minmax[1], 2)],
        'train_step_mfu_pct': round(
            100 * train_flops * eps_per_sec / batch / 394e12, 2),
    }


if __name__ == '__main__':
    main()
