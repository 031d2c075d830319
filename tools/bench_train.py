"""Training-throughput benchmark on one chip (reference-scale episodes).

Stages K synthetic episodes at the reference geometry (608x1024 queries,
2-way 3-shot 320px supports, bs as given) and times scan-staged train
steps.  Prints one JSON line.

Usage: python tools/bench_train.py [batch_size] [K]
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import utils as _cli_utils; _cli_utils.enable_compilation_cache()  # persistent XLA cache
import jax.numpy as jnp

from dana_tpu.engine import optim, train as te
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp


def main(bs=4, k=8):
    config = dana.DanaConfig(n_way=2, n_shot=3,
                             compute_dtype=jnp.bfloat16)
    params = to_jnp(dana.init_params(config, seed=0))
    trainable = optim.trainable_mask(params)
    state = te.create_train_state(params, 1e-3)

    key = jax.random.PRNGKey(0)
    batches = {
        'im_data': jax.random.normal(key, (k, bs, 608, 1024, 3)) * 50,
        'im_info': jnp.tile(jnp.array([[600.0, 1000.0, 1.0]]), (k, bs, 1)),
        'gt_boxes': jnp.tile(
            jnp.array([[[50.0, 50.0, 400.0, 300.0, 1.0]]
                       + [[0.0] * 5] * 19]), (k, bs, 1, 1)),
        'support_ims': jax.random.normal(
            key, (k, bs, 6, 320, 320, 3)) * 50,
    }

    def loss(params, ep, rng):
        return te.loss_fn(params, config, ep, rng)

    @jax.jit
    def run(state, batches, rng):
        def body(st, ep):
            k2 = jax.random.fold_in(rng, st.step)
            (_, m), g = jax.value_and_grad(loss, has_aux=True)(
                st.params, ep, k2)
            p2, o2 = optim.sgd_update(st.params, g, st.opt,
                                      trainable=trainable)
            return te.TrainState(p2, o2, st.step + 1), m['loss']
        st, losses = jax.lax.scan(body, state, batches)
        return st, losses.mean()

    def _force(st):
        # block_until_ready can ack early through the axon tunnel;
        # a device_get of a real buffer cannot
        import numpy as np
        np.asarray(jax.device_get(st.step))
        np.asarray(jax.device_get(
            jax.tree.leaves(st.params)[0]))

    batches = jax.device_put(batches)
    state, _ = run(state, batches, jax.random.PRNGKey(1))
    _force(state)

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, _ = run(state, batches, jax.random.PRNGKey(2 + i))
        _force(state)
        return time.perf_counter() - t0

    t1 = timed(1)
    t4 = timed(4)
    dt = max((t4 - t1) / 3.0, 1e-6)          # per run(k steps)
    steps_per_sec = k / dt
    print(json.dumps({
        'metric': f'dana_r50_train_steps_per_sec_bs{bs}_608x1024',
        'value': round(steps_per_sec, 3),
        'unit': 'steps/s',
        'episodes_per_sec': round(steps_per_sec * bs, 2),
    }))


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
