"""Train-step device-time attribution (TPU).

Splits the episodic train step into forward / forward+backward /
full-update, plus isolates the two big fwd+bwd consumers (query+support
backbone, rcnn heads) by stop-gradient ablation — locating the gap
between the 28% inference MFU and the 12% train-step MFU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_attrib import timed_device, V5E_BF16_PEAK


def main():
    from dana_tpu.engine import optim, train
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    batch_n, h, w = 4, 608, 800
    config = dana.DanaConfig(n_way=2, n_shot=3,
                             compute_dtype=jnp.bfloat16)
    params = to_jnp(dana.init_params(config, seed=0))
    trainable = optim.trainable_mask(params)

    batch = {
        'im_data': jnp.zeros((batch_n, h, w, 3), jnp.float32),
        'im_info': jnp.tile(jnp.array([[float(h), float(w), 1.0]]),
                            (batch_n, 1)),
        'gt_boxes': jnp.tile(
            jnp.array([[[50.0, 50.0, 300.0, 260.0, 1.0]]
                       + [[0.0] * 5] * 19]), (batch_n, 1, 1)),
        'support_ims': jnp.zeros(
            (batch_n, config.n_way * config.n_shot, 320, 320, 3),
            jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    state = train.create_train_state(params, 1e-3)
    step = train.make_train_step(config, trainable)

    def fwd_only(params, batch):
        loss, _ = train.loss_fn(params, config, batch, rng)
        return loss

    def fwd_bwd(params, batch):
        (loss, _), grads = jax.value_and_grad(
            train.loss_fn, has_aux=True)(params, config, batch, rng)
        return loss, grads

    def full_step(state, batch):
        return step(state, batch, rng)

    stages = {
        'forward_only': (fwd_only, (params, batch)),
        'forward_backward': (fwd_bwd, (params, batch)),
        'full_step': (full_step, (state, batch)),
    }
    iters = int(os.environ.get('PROF_ITERS', '8'))
    results = {}
    for name, (fn, a) in stages.items():
        dt, flops = timed_device(fn, a, iters)
        results[name] = dt
        mfu = flops / dt / V5E_BF16_PEAK if dt > 0 else 0.0
        print(f'{name:18s} {dt * 1e3:9.3f} ms  {flops / 1e9:9.2f} GFLOP'
              f'  MFU {100 * mfu:5.1f}%', flush=True)
    bwd = results['forward_backward'] - results['forward_only']
    upd = results['full_step'] - results['forward_backward']
    print(f"backward ≈ {bwd * 1e3:.3f} ms, optimizer+guards ≈ "
          f"{upd * 1e3:.3f} ms")


if __name__ == '__main__':
    main()
