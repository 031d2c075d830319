"""Train-step device-time attribution (TPU).

Splits the episodic train step into forward / forward+backward /
full-update, measures the frozen-gradient saving (grads over the FULL
tree — the round-2 behavior — vs stop_gradient on frozen leaves, the
round-3 behavior matching the reference's requires_grad=False freeze,
dana.py:351-368), and attributes BACKWARD time per backbone stage by
cumulative trainable-mask widening: grads w.r.t. heads only need no
backbone backward at all; adding layer4, then layer3, then layer2
extends the backward chain one stage deeper, so successive differences
isolate each stage's backward cost (VERDICT r2 item 1/2).

Run on TPU: python tools/profile_train.py            (full attribution)
CPU smoke:  PROF_DRY=1 python tools/profile_train.py (tiny shapes, 1 iter)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_attrib import timed_device, V5E_BF16_PEAK


def _mask_from_prefixes(params, allowed):
    """Trainable mask keeping only leaves whose dotted path starts with
    one of `allowed` ('heads' = everything outside the backbone)."""
    from jax.tree_util import tree_map_with_path

    def leaf(path, _):
        p = '.'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                     for k in path)
        if p.startswith('backbone.'):
            return any(p.startswith(a) for a in allowed)
        return 'heads' in allowed
    return tree_map_with_path(leaf, params)


def _and_masks(a, b):
    return jax.tree.map(lambda x, y: x and y, a, b)


def main():
    from dana_tpu.engine import optim, train
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    dry = bool(int(os.environ.get('PROF_DRY', '0')))
    if dry:
        batch_n, h, w = 1, 128, 160
    else:
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
            jnp.array([[[50.0, 50.0, 100.0, 100.0, 1.0]]
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

    def fwd_bwd_full(params, batch):
        # round-2 behavior: value_and_grad over the FULL tree — backward
        # runs through conv1/bn1/layer1 even though those grads are
        # discarded by sgd_update
        (loss, _), grads = jax.value_and_grad(
            train.loss_fn, has_aux=True)(params, config, batch, rng)
        return loss, grads

    def make_fwd_bwd(mask):
        def f(params, batch):
            def loss_of(p):
                p = jax.tree.map(
                    lambda x, t: x if t else jax.lax.stop_gradient(x),
                    p, mask)
                return train.loss_fn(p, config, batch, rng)
            (loss, _), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            return loss, grads
        return f

    def full_step(state, batch):
        return step(state, batch, rng)

    # cumulative backward depth: heads only -> +layer4 -> +layer3 ->
    # +layer2 (= the production trainable mask with FIXED_BLOCKS=1)
    cum = {
        'bwd_heads_only': ['heads'],
        'bwd_+layer4': ['heads', 'backbone.layer4'],
        'bwd_+layer3': ['heads', 'backbone.layer4', 'backbone.layer3'],
        'bwd_+layer2(prod)': ['heads', 'backbone.layer4',
                              'backbone.layer3', 'backbone.layer2'],
    }
    stages = {
        'forward_only': (fwd_only, (params, batch)),
        'fwd_bwd_FULLTREE(r2)': (fwd_bwd_full, (params, batch)),
    }
    for name, allowed in cum.items():
        mask = _and_masks(_mask_from_prefixes(params, allowed), trainable)
        stages[name] = (make_fwd_bwd(mask), (params, batch))
    stages['full_step'] = (full_step, (state, batch))

    iters = 1 if dry else int(os.environ.get('PROF_ITERS', '8'))
    results = {}
    for name, (fn, a) in stages.items():
        dt, flops = timed_device(fn, a, iters)
        results[name] = dt
        mfu = flops / dt / V5E_BF16_PEAK if dt > 0 else 0.0
        print(f'{name:22s} {dt * 1e3:9.3f} ms  {flops / 1e9:9.2f} GFLOP'
              f'  MFU {100 * mfu:5.1f}%', flush=True)

    fwd = results['forward_only']
    prod = results['bwd_+layer2(prod)']
    print('--- backward attribution (cumulative diffs vs forward) ---')
    prev, prev_name = fwd, 'forward'
    for name in cum:
        d = results[name] - prev
        print(f'{name:22s} +{d * 1e3:8.3f} ms over {prev_name}')
        prev, prev_name = results[name], name
    frozen_saving = results['fwd_bwd_FULLTREE(r2)'] - prod
    print(f'frozen-grad saving      {frozen_saving * 1e3:8.3f} ms '
          f'(FULLTREE backward minus production trainable-masked)')
    print(f'optimizer+guards      ≈ '
          f'{(results["full_step"] - prod) * 1e3:8.3f} ms')


if __name__ == '__main__':
    main()
