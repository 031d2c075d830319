"""Jitted episodic train/predict steps + data-parallel sharding.

Replaces the reference's train loop body (train.py:122-144) and its
nn.DataParallel scatter/gather (train.py:104-105, 138-139) with ONE
pjit-compiled step over a 1-D `data` mesh: batch sharded on `data`,
params/optimizer replicated, gradient mean inserted by XLA as an ICI
all-reduce.  The total loss is the sum of the four heads' losses
(train.py:137).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dana_tpu.engine import optim
from dana_tpu.models import dana


class TrainState(NamedTuple):
    params: Any
    opt: optim.SGDState
    step: jnp.ndarray


def create_train_state(params, lr: float) -> TrainState:
    opt = optim.sgd_init(params)._replace(lr=jnp.asarray(lr, jnp.float32))
    return TrainState(params=params, opt=opt, step=jnp.asarray(0, jnp.int32))


def restore_optimizer(state: TrainState, opt_payload) -> TrainState:
    """Rebuild momentum velocity from a checkpoint's `optimizer` payload
    (reference train.py:96-99 restores the full optimizer state dict on
    --r resume; dropping it restarts velocity at zero)."""
    if opt_payload is None:
        return state
    vel = (opt_payload.velocity if hasattr(opt_payload, 'velocity')
           else opt_payload['velocity'])
    vel = jax.tree.map(jnp.asarray, vel)
    return state._replace(opt=state.opt._replace(velocity=vel))


def loss_fn(params, config: dana.DanaConfig, batch, rng, model='DAnA'):
    """Episodic loss for any framework (train.py:137: total = sum of the
    four heads' losses)."""
    if model in ('DAnA', 'cisa'):
        out = dana.forward(params, config, batch['im_data'],
                           batch['im_info'], batch['support_ims'],
                           training=True, gt_boxes=batch['gt_boxes'],
                           rng=rng)
    elif model == 'frcnn':
        from dana_tpu.models import frameworks
        out = frameworks.frcnn_forward(
            params, config, batch['im_data'], batch['im_info'],
            training=True, gt_boxes=batch['gt_boxes'], rng=rng)
    elif model == 'meta':
        from dana_tpu.models import frameworks
        out = frameworks.meta_forward(
            params, config, batch['im_data'], batch['im_info'],
            batch['support_ims'], training=True,
            gt_boxes=batch['gt_boxes'],
            all_cls_gt_boxes=batch.get('all_gt_boxes'), rng=rng)
    else:
        from dana_tpu.models import frameworks
        out = frameworks.forward_fn(model)(
            params, config, batch['im_data'], batch['im_info'],
            batch['support_ims'], training=True,
            gt_boxes=batch['gt_boxes'], rng=rng)
    losses = {k: out[k] for k in
              ('rpn_loss_cls', 'rpn_loss_box', 'rcnn_loss_cls',
               'rcnn_loss_bbox')}
    total = sum(losses.values())
    metrics = dict(losses, loss=total,
                   fg_cnt=(out['rois_label'] > 0).sum(),
                   bg_cnt=(out['rois_label'] == 0).sum())
    if 'param_updates' in out:      # e.g. FGN train-mode BN running stats
        metrics['_param_updates'] = jax.lax.stop_gradient(
            out['param_updates'])
    return total, metrics


def make_train_step(config: dana.DanaConfig, trainable=None, *, momentum=0.9,
                    weight_decay=0.0005, double_bias=True, clip_norm=0.0,
                    skip_nonfinite=True, model='DAnA'):
    """Build the jitted train step.  `trainable` is a Python-bool tree
    (trace-time constant: frozen leaves never enter the autodiff update).

    skip_nonfinite: a step whose loss or grads are non-finite applies no
    update (params/velocity unchanged) and reports metrics['skipped']=1 —
    lightweight failure containment the reference lacks (a NaN batch
    there poisons the run silently)."""

    @jax.jit
    def step(state: TrainState, batch, rng):
        key = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, config, batch, key, model)
        if clip_norm:
            grads = optim.clip_gradients(grads, clip_norm)
        new_params, new_opt = optim.sgd_update(
            state.params, grads, state.opt, momentum=momentum,
            weight_decay=weight_decay, double_bias=double_bias,
            trainable=trainable)
        updates = metrics.pop('_param_updates', None)
        if updates is not None:     # non-grad buffer updates (BN stats)
            for mod, stats in updates.items():
                new_params[mod] = dict(new_params[mod], **stats)
        if skip_nonfinite:
            finite = jnp.isfinite(loss)
            for g in jax.tree.leaves(grads):
                finite &= jnp.all(jnp.isfinite(g))
            new_params = jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new_params,
                state.params)
            new_opt = new_opt._replace(velocity=jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new_opt.velocity,
                state.opt.velocity))
            metrics['skipped'] = 1.0 - finite.astype(jnp.float32)
        return TrainState(params=new_params, opt=new_opt,
                          step=state.step + 1), metrics

    return step


def make_multi_train_step(config: dana.DanaConfig, trainable=None, **kw):
    """Scan-staged training: one jitted call executes a whole stack of
    batches ([K, ...] leading axis) via lax.scan.  Amortizes dispatch
    latency — on the TPU tunnel a single-step dispatch costs ~100s of ms
    of RTT while the step itself runs in ~20 ms; K=16 staged steps
    execute in ~0.3 s total (tools/overfit_probe.py).  Returns
    (new_state, stacked metrics)."""
    step = make_train_step(config, trainable, **kw)

    @jax.jit
    def multi_step(state: TrainState, batches, rng):
        return jax.lax.scan(lambda st, b: step(st, b, rng), state, batches)

    return multi_step


@functools.partial(jax.jit, static_argnames=('config',))
def predict_step(params, config: dana.DanaConfig, im_data, im_info,
                 support_ims):
    return dana.forward(params, config, im_data, im_info, support_ims,
                        training=False)


# ----------------------------------------------------------------------------
# Data-parallel mesh wiring
# ----------------------------------------------------------------------------

def make_mesh(devices=None, axis: str = 'data') -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(devices=None, data: int = 0, model: int = 1) -> Mesh:
    """2-D (data, model) mesh for combined data+tensor parallelism.

    `data`/`model` give the axis extents (0 = infer from device count).
    The reference has no multi-GPU story beyond DataParallel
    (train.py:104-105); the model axis is our TPU-native extension for
    scaling the wide heads — XLA inserts the all-gathers/reduce-scatters
    implied by the param shardings of shard_params_tp.
    """
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not model:
        model = 2 if n % 2 == 0 and n >= 4 else 1
    if not data:
        data = n // model
    assert data * model == n, (data, model, n)
    return Mesh(np.array(devices).reshape(data, model), ('data', 'model'))


def _tp_spec(path_str: str, leaf) -> P:
    """PartitionSpec for one param leaf under tensor parallelism.

    Column-sharding (output features over 'model') for the wide
    projection/conv weights; everything else replicated.  XLA's sharding
    propagation shards the matching activations and inserts the
    collectives.
    """
    tp_cols = ('rpn_adapt_q_layer', 'rpn_adapt_k_layer',
               'rcnn_adapt_q_layer', 'rcnn_adapt_k_layer',
               'RPN_Conv', 'linear1')
    if any(f"['{name}']" in path_str for name in tp_cols) \
            and path_str.endswith("['weight']") and leaf.ndim >= 2 \
            and leaf.shape[-1] % 2 == 0:
        return P(*([None] * (leaf.ndim - 1) + ['model']))
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place a param tree with TP column-sharding over mesh axis 'model'
    (biases and small/irregular leaves replicated)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        spec = _tp_spec(jax.tree_util.keystr(path), leaf)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_batch(batch, mesh: Mesh, axis: str = 'data'):
    """Place a host batch with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_state_tp(state: TrainState, mesh: Mesh) -> TrainState:
    """TrainState placement for a 2-D (data, model) mesh: params and
    momentum velocity TP-sharded consistently, scalars replicated."""
    params = shard_params_tp(state.params, mesh)
    vel = shard_params_tp(state.opt.velocity, mesh)
    rep = NamedSharding(mesh, P())
    opt = state.opt._replace(
        velocity=vel, lr=jax.device_put(state.opt.lr, rep))
    return TrainState(params=params, opt=opt,
                      step=jax.device_put(state.step, rep))
