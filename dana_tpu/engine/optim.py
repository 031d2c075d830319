"""Training optimizer: torch-semantics SGD with the reference's per-param
group rules, as a pure pytree transform.

Parity source: train.py:78-89 builds param groups — biases get
lr * (DOUBLE_BIAS + 1) and weight_decay 0 (unless BIAS_DECAY); everything
else lr / TRAIN.WEIGHT_DECAY — and torch.optim.SGD semantics
(g += wd * p; v = mu * v + g; p -= lr * v).  Frozen params (requires_grad
False in the reference: conv1/bn1, FIXED_BLOCKS resnet layers, every
BatchNorm — dana.py:351-368) are expressed as a boolean `trainable` tree;
their grads are zeroed so velocity stays zero and params untouched.

Adam (the --o adam branch, train.py:90-91) is provided via optax.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    velocity: Any
    lr: jnp.ndarray          # scalar; mutated by step-decay schedule


def _path_str(path) -> str:
    return '.'.join(str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path)


def trainable_mask(params, *, fixed_blocks: int = 1,
                   arch_prefix: str = 'backbone') -> Any:
    """Boolean tree: False for frozen leaves (dana.py:351-368 semantics):
    backbone conv1/bn1, layer1..layer{fixed_blocks}, and all BN stats/
    affine params anywhere in the backbone."""
    frozen_layers = {f'layer{i}' for i in range(1, fixed_blocks + 1)}

    def leaf_mask(path, leaf):
        p = _path_str(path)
        parts = p.split('.')
        if parts[0] == arch_prefix:
            if parts[1] in ('conv1', 'bn1'):
                return False
            if parts[1] in frozen_layers:
                return False
            # frozen BN: any bn* module or downsample.1, and running stats
            if any(x.startswith('bn') for x in parts) or \
                    parts[-2:-1] == ['1'] and 'downsample' in parts:
                return False
        if parts[-1] in ('running_mean', 'running_var'):
            return False
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def finetune_mask(params, head_keys=('RCNN_cls_score', 'RCNN_bbox_pred',
                                     'output_score_layer',
                                     'rcnn_transform_layer')):
    """Trainable mask for finetuning: heads only (parity:
    FasterRCNN.finetune, faster_rcnn.py:192-204 freezes everything but
    the cls/bbox heads)."""
    def leaf_mask(path, leaf):
        return _path_str(path).split('.')[0] in head_keys
    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def _bias_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _path_str(path).endswith('bias'), params)


def sgd_init(params) -> SGDState:
    return SGDState(velocity=jax.tree.map(jnp.zeros_like, params),
                    lr=jnp.asarray(0.0, jnp.float32))


def sgd_update(params, grads, state: SGDState, *, momentum=0.9,
               weight_decay=0.0005, double_bias=True, bias_decay=False,
               trainable=None):
    """One torch-SGD step. Returns (new_params, new_state)."""
    bias = _bias_mask(params)
    if trainable is None:
        trainable = jax.tree.map(lambda _: True, params)

    treedef = jax.tree.structure(params)
    flat = [jax.tree.leaves(t) for t in
            (params, grads, state.velocity, bias, trainable)]
    new_p, new_v = [], []
    for p, g, v, is_bias, is_trainable in zip(*flat):
        if not is_trainable:
            new_p.append(p)
            new_v.append(v)
            continue
        wd = 0.0 if (is_bias and not bias_decay) else weight_decay
        lr_mult = 2.0 if (is_bias and double_bias) else 1.0
        v = momentum * v + (g + wd * p)
        new_p.append(p - state.lr * lr_mult * v)
        new_v.append(v)
    return (jax.tree.unflatten(treedef, new_p),
            SGDState(velocity=jax.tree.unflatten(treedef, new_v),
                     lr=state.lr))


def clip_gradients(grads, clip_norm: float, trainable=None):
    """Per-leaf total-norm clip (net_utils.clip_gradient:37-48 semantics:
    one global norm over all grads, scale if above).  With `trainable`,
    the norm covers trainable leaves only — torch's version iterates
    model.parameters() and skips p.grad None, i.e. frozen params never
    enter the norm; folding frozen leaves in here would also force their
    (symbolically zero) backward to materialize."""
    g_leaves = jax.tree.leaves(grads)
    t_leaves = (jax.tree.leaves(trainable) if trainable is not None
                else [True] * len(g_leaves))
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g, t in zip(g_leaves, t_leaves) if t))
    scale = jnp.minimum(1.0, clip_norm / jnp.maximum(total, 1e-12))
    if trainable is None:
        return jax.tree.map(lambda g: g * scale, grads)
    return jax.tree.map(lambda g, t: g * scale if t else g, grads,
                        trainable)
