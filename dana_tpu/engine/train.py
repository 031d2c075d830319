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

    def _loss(params, batch, key):
        # Cut the backward chain at frozen subtrees: stop_gradient on
        # frozen leaves makes their grads symbolic zeros, so XLA DCEs the
        # backward convs through conv1/bn1/layer1 entirely.  The reference
        # freezes them outright (requires_grad=False, dana.py:351-368) —
        # frozen means NO backward work, not "computed then discarded".
        if trainable is not None:
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, trainable)
        return loss_fn(params, config, batch, key, model)

    @jax.jit
    def step(state: TrainState, batch, rng):
        key = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, batch, key)
        if clip_norm:
            # trainable leaves only — torch's clip_gradient only sees
            # params with grads (net_utils.py:37-48)
            grads = optim.clip_gradients(grads, clip_norm,
                                         trainable=trainable)
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
            g_leaves = jax.tree.leaves(grads)
            t_leaves = (jax.tree.leaves(trainable) if trainable is not None
                        else [True] * len(g_leaves))
            for g, t in zip(g_leaves, t_leaves):
                if t:   # frozen grads are symbolic zeros; folding them in
                    # would force their backward to materialize
                    finite &= jnp.all(jnp.isfinite(g))
            sel = (lambda n, o, t: jnp.where(finite, n, o) if t else n)
            new_params = jax.tree.map(
                sel, new_params, state.params,
                trainable if trainable is not None
                else jax.tree.map(lambda _: True, new_params))
            new_opt = new_opt._replace(velocity=jax.tree.map(
                sel, new_opt.velocity, state.opt.velocity,
                trainable if trainable is not None
                else jax.tree.map(lambda _: True, new_opt.velocity)))
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

# Mesh construction and placement live in dana_tpu.parallel (the stable
# public surface); re-exported here so engine-level callers and older
# call sites keep working.
from dana_tpu.parallel import (make_mesh, make_mesh_2d,  # noqa: F401,E402
                               make_mesh_dcn, replicate, shard_batch,
                               shard_batch_dcn, shard_params_tp,
                               shard_state_tp)
