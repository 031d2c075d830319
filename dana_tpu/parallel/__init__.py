"""Device-mesh parallelism: mesh construction and placement.

The reference's only parallelism is single-process nn.DataParallel
(train.py:104-105).  Here scaling is expressed the TPU way:

  * 1-D Mesh('data'): batch sharded over 'data', params/optimizer
    replicated, XLA inserting the gradient all-reduce over ICI —
    the semantic replacement for DataParallel's scatter/gather +
    loss .mean() (reference train.py:138-139).
  * 2-D Mesh('data', 'model'): additionally column-shards the wide
    projection/conv weights over 'model' (tensor parallelism — beyond
    the reference); XLA's sharding propagation shards the matching
    activations and inserts the TP collectives.

The jitted step functions live in dana_tpu.engine.train; this module
owns mesh construction and placement and is the stable public surface
(engine.train re-exports these names for compatibility).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = 'data') -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(devices=None, data: int = 0, model: int = 0) -> Mesh:
    """2-D (data, model) mesh for combined data+tensor parallelism.

    `data`/`model` give the axis extents (0 = infer from device count).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not model:
        # honor an explicit data extent (model = n/data); else default to
        # tp2 when the device count allows
        model = n // data if data else (2 if n % 2 == 0 and n >= 4 else 1)
    if not data:
        data = n // model
    if data * model != n or data < 1:
        raise ValueError(
            f'mesh axes (data={data}, model={model}) do not tile the '
            f'{n} available devices — the model/tp extent must divide '
            f'the device count')
    return Mesh(np.array(devices).reshape(data, model), ('data', 'model'))


def make_mesh_dcn(slices: int, devices=None) -> Mesh:
    """Two-level data-parallel mesh for multi-slice deployments.

    Axes ('slice', 'data'): 'slice' is the slow DCN-connected axis (one
    entry per TPU slice), 'data' the fast ICI axis within a slice.
    Batches shard over BOTH axes (shard_batch_dcn); the gradient
    all-reduce XLA inserts then decomposes into an intra-slice
    reduce-scatter/all-gather riding ICI plus one small cross-slice
    all-reduce riding DCN — the standard two-level DP recipe.  The
    reference has no cross-host story at all (§2.7: single-process
    nn.DataParallel); this is the TPU-native scale-out path.

    Devices must be grouped slice-major: jax.devices() already orders
    by slice for multislice jobs (jax.experimental.mesh_utils.
    create_hybrid_device_mesh is the general tool for asymmetric
    topologies); on the CPU test platform any grouping works.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if slices < 1 or n % slices:
        raise ValueError(f'{slices} slices do not tile {n} devices')
    return Mesh(np.array(devices).reshape(slices, n // slices),
                ('slice', 'data'))


def shard_batch_dcn(batch, mesh: Mesh):
    """Batch placement on a ('slice', 'data') mesh: the leading batch
    axis shards over the flattened slice x data grid."""
    if jax.process_count() > 1:
        from dana_tpu.parallel import distributed
        return distributed.shard_batch_local(batch, mesh,
                                             P(('slice', 'data')))
    sharding = NamedSharding(mesh, P(('slice', 'data')))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def _tp_spec(path_str: str, leaf, model_size: int = 2) -> P:
    """PartitionSpec for one param leaf under tensor parallelism.

    Column-sharding (output features over 'model') for the wide
    projection/conv weights — only when the output dim divides the
    mesh's actual 'model' axis extent; everything else replicated.
    """
    tp_cols = ('rpn_adapt_q_layer', 'rpn_adapt_k_layer',
               'rcnn_adapt_q_layer', 'rcnn_adapt_k_layer',
               'RPN_Conv', 'linear1')
    if any(f"['{name}']" in path_str for name in tp_cols) \
            and path_str.endswith("['weight']") and leaf.ndim >= 2 \
            and model_size > 0 and leaf.shape[-1] % model_size == 0:
        return P(*([None] * (leaf.ndim - 1) + ['model']))
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place a param tree with TP column-sharding over mesh axis 'model'
    (biases and small/irregular leaves replicated)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        'model', 1)
    out = []
    for path, leaf in flat:
        spec = _tp_spec(jax.tree_util.keystr(path), leaf, model_size)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_batch(batch, mesh: Mesh, axis: str = 'data'):
    """Place a host batch with leading batch axis sharded over the mesh.

    On a two-level ('slice', 'data') DCN mesh the batch must shard over
    BOTH axes — sharding over 'data' alone would replicate the batch
    across slices and multi-slice DP would silently compute identical
    gradients everywhere — so dispatch on the mesh's axis names.

    Under a multi-process runtime (jax.distributed, multi-host pods)
    `batch` holds only this process's row block and the global array is
    assembled via make_array_from_process_local_data — device_put of a
    host-global array only works when ONE process addresses every
    device (parallel.distributed).
    """
    if 'slice' in mesh.axis_names and axis == 'data':
        return shard_batch_dcn(batch, mesh)
    if jax.process_count() > 1:
        from dana_tpu.parallel import distributed
        return distributed.shard_batch_local(batch, mesh, P(axis))
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_query_spatial(im, mesh: Mesh, axis: str = 'model'):
    """Spatial partitioning (SP): shard the query image's H axis.

    im is [B, H, W, C] (3-channel or s2d-packed 12-channel).  Placing H
    over a mesh axis makes GSPMD spatially partition every backbone conv
    — XLA inserts the halo exchanges between neighbour shards
    automatically, so ONE query image's conv work spreads over the axis.
    This is the latency lever when a single image's backbone dominates
    (e.g. bs=1 serving of large queries): unlike TP (which needs wide
    channel dims to amortize collectives — measured 2.35x dp-only at
    this model's 2048ch scale, PERF.md), SP splits the spatial extent,
    which IS large at detection resolutions (608x1024 -> 38x64 at
    stride 16).  Verified equal to the unsharded forward on the CPU
    mesh (tests/test_parallel.py).
    """
    n = int(mesh.shape[axis])
    if im.shape[1] % n:
        raise ValueError(
            f'spatial sharding needs H % {n} == 0, got H={im.shape[1]} '
            f'(s2d-packed queries have odd H=H/2+3 and cannot SP-shard — '
            f'use the direct 3-channel stem under --sp)')
    return jax.device_put(im, NamedSharding(mesh, P('data', axis)))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_state_tp(state, mesh: Mesh):
    """TrainState placement for a 2-D (data, model) mesh: params and
    momentum velocity TP-sharded consistently, scalars replicated.
    Structural (`_replace`-based) so it works on any TrainState-shaped
    NamedTuple without importing engine.train."""
    params = shard_params_tp(state.params, mesh)
    vel = shard_params_tp(state.opt.velocity, mesh)
    rep = NamedSharding(mesh, P())
    opt = state.opt._replace(
        velocity=vel, lr=jax.device_put(state.opt.lr, rep))
    return state._replace(params=params, opt=opt,
                          step=jax.device_put(state.step, rep))


__all__ = ['make_mesh', 'make_mesh_2d', 'make_mesh_dcn', 'shard_params_tp',
           'shard_batch', 'shard_batch_dcn', 'shard_query_spatial',
           'replicate', 'shard_state_tp']
