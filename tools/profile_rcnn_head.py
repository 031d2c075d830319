"""Sub-stage attribution inside rcnn_head + backbone stem experiments.

Decomposes the R-CNN head (the top consumer after the shot-fused CISA
rework) into: layer4 tail, q projection, fused attention core,
transform+FFN.  Run on the real TPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_attrib import timed_device, V5E_BF16_PEAK


def main():
    from dana_tpu.models import dana
    from dana_tpu.models import layers as L
    from dana_tpu.models.layers import to_jnp

    b, r = 8, 300
    config = dana.DanaConfig(n_way=2, n_shot=3, compute_dtype=jnp.bfloat16)
    params = to_jnp(dana.init_params(config, seed=0))
    cdt = config.compute_dtype
    c = config.feat_dim
    ph = pw = config.pooling_size

    pooled = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                     (b, r, ph, pw, c), cdt)
    sup_pooled = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                         (b, config.n_shot, ph, pw, c), cdt)
    roi_pe = jnp.asarray(dana.positional_encoding(ph * pw, c), cdt)

    q_tokens = pooled.reshape(b, r, ph * pw, c) + roi_pe
    s_tokens = sup_pooled.reshape(b, config.n_shot, ph * pw, c) + roi_pe
    qf = jax.random.normal(jax.random.PRNGKey(2),
                           (b, r * ph * pw, config.rcnn_reduce_dim), cdt)
    kf = jax.random.normal(jax.random.PRNGKey(3),
                           (b, config.n_shot, ph * pw,
                            config.rcnn_reduce_dim), cdt)
    unary = jax.nn.softmax(jax.random.normal(
        jax.random.PRNGKey(4), (b, config.n_shot, ph * pw)), axis=-1)
    corr = jax.random.normal(jax.random.PRNGKey(5),
                             (b, r, ph * pw, 2 * c), cdt)

    from dana_tpu.ops import cisa_attention as fused

    def tail(p, pooled_):
        return dana.backbone_tail(p, config,
                                  pooled_.reshape(b * r, ph, pw, c))

    def qproj(p, q_):
        q = L.linear(q_, p['rcnn_adapt_q_layer'])
        return q - q.mean(axis=-2, keepdims=True)

    def attn_core(qf_, kf_, s_, u_):
        return fused.cisa_attention_shots(qf_, kf_, s_, u_,
                                          1.0 / 16.0, 0.1)

    def ffn(p, corr_):
        x = L.linear(corr_, p['rcnn_transform_layer'])
        x = x.reshape(b, r, -1)
        x = L.relu(L.linear(x, p['output_score_layer']['linear1']))
        return L.linear(x, p['output_score_layer']['linear2'])

    def full(p, pooled_, sup_):
        return dana.rcnn_head(p, config, pooled_, sup_, roi_pe)

    stages = {
        'tail_layer4': (tail, (params, pooled)),
        'q_proj': (qproj, (params, q_tokens)),
        'attn_core': (attn_core, (qf, kf, s_tokens, unary)),
        'transform_ffn': (ffn, (params, corr)),
        'rcnn_head_full': (full, (params, pooled, sup_pooled)),
    }
    iters = int(os.environ.get('PROF_ITERS', '24'))
    for name, (fn, a) in stages.items():
        dt, flops = timed_device(fn, a, iters)
        mfu = flops / dt / V5E_BF16_PEAK if dt > 0 else 0.0
        print(f'{name:16s} {dt * 1e3:8.3f} ms  {flops / 1e9:8.2f} GFLOP  '
              f'MFU {100 * mfu:5.1f}%', flush=True)


if __name__ == '__main__':
    main()
