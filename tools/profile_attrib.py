"""Per-stage device-time attribution for DAnA inference on the real TPU.

Answers VERDICT round-1 item 3: where do the ~N ms/batch go?  Each stage
(backbone / support encode / RPN attention / RPN heads / proposal NMS /
RoIAlign / R-CNN head / postprocess) is jitted separately on
representative intermediate shapes and timed with the same
scan-differencing discipline bench.py uses (the remote-TPU tunnel adds
~100s of ms of dispatch RTT that must not be attributed to the device).

Also prints an XLA cost-analysis FLOP count and the implied MFU per stage
and for the full forward, against the v5e bf16 peak.

Usage: python tools/profile_attrib.py [--batch 8] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 394e12  # TFLOP/s, TPU v5e (197 f32)


def timed_device(fn, args, iters, n_calls=4):
    """Compile fn over a lax.scan of `iters` staged inputs; difference
    1-call vs n_calls pipelined timings to cancel dispatch latency.
    Returns seconds per single fn application."""
    @jax.jit
    def many(*a):
        # every float leaf gets a per-iteration traced epsilon: without
        # it the body is loop-invariant and XLA hoists the whole stage
        # out of the scan (measured: exactly iters-fold underreporting)
        def perturb(x, t):
            if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype,
                                                      jnp.floating):
                return x + (t * 1e-30).astype(x.dtype)
            return x

        def body(acc, t):
            aa = [jax.tree.map(lambda x: perturb(x, t), arg) for arg in a]
            out = fn(*aa)
            leaves = [x for x in jax.tree.leaves(out)
                      if hasattr(x, 'dtype')]
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.float32))
        return acc

    lowered = jax.jit(fn).lower(*args)
    try:
        cost = lowered.compile().cost_analysis()
        flops = (cost or {}).get('flops', 0.0)
    except Exception:
        flops = 0.0

    out = many(*args)
    np.asarray(jax.device_get(out))  # warmup + compile

    def run(n):
        t0 = time.perf_counter()
        outs = [many(*args) for _ in range(n)]
        np.asarray(jax.device_get(outs[-1]))
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(n_calls + 1)
    dt = max((tn - t1) / n_calls, 1e-9) / iters
    return dt, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--height', type=int, default=608)
    ap.add_argument('--width', type=int, default=800)
    args = ap.parse_args()

    from dana_tpu.engine.postprocess import postprocess_batch
    from dana_tpu.models import dana, rpn as rpn_lib
    from dana_tpu.models.layers import to_jnp
    from dana_tpu.core.anchors import generate_anchors, shifted_anchors

    b, h, w = args.batch, args.height, args.width
    config = dana.DanaConfig(n_way=2, n_shot=3, compute_dtype=jnp.bfloat16)
    params = to_jnp(dana.init_params(config, seed=0))
    cdt = config.compute_dtype

    im = jnp.zeros((b, h, w, 3), jnp.float32)
    info = jnp.tile(jnp.array([[float(h), float(w), 1.0]]), (b, 1))
    sup = jnp.zeros((b, config.n_shot, 320, 320, 3), jnp.float32)

    fh, fw = h // 16, w // 16
    feat = jnp.zeros((b, fh, fw, config.feat_dim), cdt)
    sup_feat = jnp.zeros((b, config.n_shot, 20, 20, config.feat_dim), cdt)
    sup_pooled = jnp.zeros((b, config.n_shot, 7, 7, config.feat_dim), cdt)
    corr = jnp.zeros((b, fh, fw, config.rpn_din), cdt)
    n_anchors = fh * fw * config.num_anchors
    probs_fg = jax.random.uniform(jax.random.PRNGKey(0), (b, n_anchors))
    deltas = jax.random.normal(jax.random.PRNGKey(1),
                               (b, n_anchors, 4)) * 0.1
    base_anchor = generate_anchors(ratios=config.anchor_ratios,
                                   scales=np.array(config.anchor_scales))
    anchors = shifted_anchors(fh, fw, config.feat_stride, base_anchor)
    r = config.test_post_nms
    rois = jnp.concatenate([
        jnp.zeros((b, r, 1)),
        jax.random.uniform(jax.random.PRNGKey(2), (b, r, 4)) * 500], -1)
    rois = rois.at[..., 3:5].add(rois[..., 1:3])
    pooled = jnp.zeros((b, r, 7, 7, config.feat_dim), cdt)
    cls_prob = jax.random.uniform(jax.random.PRNGKey(3), (b, r, 2))
    bbox_pred = jax.random.normal(jax.random.PRNGKey(4), (b, r, 4)) * 0.1

    rpn_pe = jnp.asarray(
        dana.positional_encoding(400, config.feat_dim), cdt)
    roi_pe = jnp.asarray(
        dana.positional_encoding(49, config.feat_dim), cdt)

    stages = {
        'backbone_query': (
            lambda p, x: dana.backbone_base(p, config, x.astype(cdt)),
            (params, im)),
        'support_encode': (
            lambda p, s: dana.extract_support_feats(p, config, s),
            (params, sup)),
        'rpn_attention': (
            lambda p, f, sf: dana.rpn_attention(p, config, f, sf, rpn_pe),
            (params, feat, sup_feat)),
        'rpn_heads': (
            lambda p, c: rpn_lib.rpn_forward(c, p['RCNN_rpn'],
                                             config.num_anchors),
            (params, corr)),
        'proposal_nms': (
            lambda pf, dl, ii: rpn_lib.proposal_layer(
                pf, dl, anchors, ii,
                pre_nms_top_n=config.test_pre_nms,
                post_nms_top_n=config.test_post_nms,
                nms_thresh=config.rpn_nms_thresh,
                nms_cap=config.nms_cap),
            (probs_fg, deltas, info)),
        'roi_align': (
            lambda f, ro: dana._pool_rois(config, f, ro.astype(cdt)),
            (feat, rois)),
        'rcnn_head': (
            lambda p, pl_, sp: dana.rcnn_head(p, config, pl_, sp, roi_pe),
            (params, pooled, sup_pooled)),
        'postprocess': (
            lambda ro, cp, bp, ii: postprocess_batch(ro, cp, bp, ii),
            (rois, cls_prob, bbox_pred, info)),
        'FULL_forward': (
            lambda p, x, ii, s: dana.forward(p, config, x, ii, s,
                                             training=False),
            (params, im, info, sup)),
    }

    results = {}
    for name, (fn, a) in stages.items():
        dt, flops = timed_device(fn, a, args.iters)
        results[name] = (dt, flops)
        mfu = flops / dt / V5E_BF16_PEAK if dt > 0 else 0.0
        print(f'{name:18s} {dt * 1e3:9.3f} ms  {flops / 1e9:9.2f} GFLOP  '
              f'MFU {100 * mfu:5.1f}%', flush=True)

    full_dt, full_flops = results['FULL_forward']
    parts = {k: v for k, v in results.items() if k != 'FULL_forward'}
    sum_dt = sum(dt for dt, _ in parts.values())
    print(f'\nsum-of-stages {sum_dt * 1e3:.3f} ms vs full '
          f'{full_dt * 1e3:.3f} ms '
          f'(residual {100 * (full_dt - sum_dt) / full_dt:+.1f}%)')
    print(f'imgs/s (full forward, batch {b}): {b / full_dt:.1f}')
    print(json.dumps({k: {'ms': round(dt * 1e3, 3),
                          'gflop': round(fl / 1e9, 2)}
                      for k, (dt, fl) in results.items()}))


if __name__ == '__main__':
    main()
