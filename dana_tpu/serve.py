"""Serving export: AOT-serialized inference artifacts (jax.export).

A deployment should not need the model code, a Python trace, or an XLA
re-optimization at process start.  ``export_predictor`` lowers the full
predict step (DAnA forward + box decode + NMS postprocess — the device
side of inference.py) to portable serialized StableHLO, one artifact
per static query bucket, plus the support-feature encoder; ``load``
deserializes and returns callables that compile directly on the serving
host's backend.  Params travel as ARGUMENTS (not baked constants), so
one artifact serves any checkpoint of the same architecture and the
weights keep riding the existing checkpoint format.

The reference has no serving story at all (inference.py is its only
consumer); this subsystem is TPU-production surface beyond parity.

Artifact layout (directory):
    meta.json                      config + bucket/batch table
    predict_<H>x<W>.shlo          serialized predict for each bucket
    encode_supports.shlo          support-feature encoder
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from dana_tpu.engine.postprocess import postprocess_batch
from dana_tpu.models import dana


def _predict_fn(config, pp_kwargs):
    def predict(params, im_data, im_info, sup_feat, sup_pooled):
        out = dana.forward(params, config, im_data, im_info,
                           training=False,
                           support_feats=(sup_feat, sup_pooled))
        return postprocess_batch(out['rois'], out['cls_prob'],
                                 out['bbox_pred'], im_info, **pp_kwargs)
    return predict


def _shapes_of(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree)


def export_predictor(params, config: dana.DanaConfig, out_dir,
                     buckets=((608, 1024), (1024, 608), (704, 704),
                              (608, 1216), (1216, 608)),
                     batch_size=8, sup_size=320, s2d=False,
                     platforms=None, pp_kwargs=None):
    """Serialize the predict step for each bucket + the support encoder.

    params may be the float tree or a quantized one (dana_tpu/quant.py)
    — the artifact records which via meta.json.  `s2d` exports for
    host-packed space-to-depth inputs (blob.s2d_pack surfaces).
    `platforms` e.g. ['tpu'] cross-exports from a CPU build host.
    """
    os.makedirs(out_dir, exist_ok=True)
    pp_kwargs = dict(pp_kwargs or {})
    pspec = _shapes_of(params)
    b = batch_size
    n_sup = config.n_way * config.n_shot
    kw = {'platforms': list(platforms)} if platforms else {}

    def encode(params, sup):
        return dana.extract_support_feats(params, config, sup)

    sup_shape = (1, n_sup, sup_size, sup_size, 3)
    if s2d:
        sup_shape = (1, n_sup, sup_size // 2 + 3, sup_size // 2 + 3, 12)
    enc_exp = jax_export.export(jax.jit(encode), **kw)(
        pspec, jax.ShapeDtypeStruct(sup_shape, jnp.float32))
    with open(os.path.join(out_dir, 'encode_supports.shlo'), 'wb') as f:
        f.write(enc_exp.serialize())

    # support-feature shapes for the predict signature
    sup_feat, sup_pooled = jax.eval_shape(
        lambda p, s: encode(p, s), pspec,
        jax.ShapeDtypeStruct(sup_shape, jnp.float32))

    predict = _predict_fn(config, pp_kwargs)
    table = []
    for (h, w) in buckets:
        if s2d:
            im = jax.ShapeDtypeStruct((b, h // 2 + 3, w // 2 + 3, 12),
                                      jnp.float32)
        else:
            im = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
        info = jax.ShapeDtypeStruct((b, 3), jnp.float32)
        bf = jax.ShapeDtypeStruct((b,) + tuple(sup_feat.shape[1:]),
                                  sup_feat.dtype)
        bp = jax.ShapeDtypeStruct((b,) + tuple(sup_pooled.shape[1:]),
                                  sup_pooled.dtype)
        exp = jax_export.export(jax.jit(predict), **kw)(
            pspec, im, info, bf, bp)
        name = f'predict_{h}x{w}.shlo'
        with open(os.path.join(out_dir, name), 'wb') as f:
            f.write(exp.serialize())
        table.append({'bucket': [h, w], 'file': name})

    meta = {
        'batch_size': b, 'n_way': config.n_way, 'n_shot': config.n_shot,
        'arch': config.arch, 's2d': bool(s2d), 'sup_size': sup_size,
        'buckets': table, 'postprocess': pp_kwargs,
        'quantized': _is_quantized(params),
    }
    with open(os.path.join(out_dir, 'meta.json'), 'w') as f:
        json.dump(meta, f, indent=1)
    return meta


def _is_quantized(params):
    found = [False]

    def look(t):
        if isinstance(t, dict):
            if 'w_int8' in t:
                found[0] = True
            for v in t.values():
                look(v)
    look(params)
    return found[0]


class Predictor:
    """Deserialized serving bundle: pick the artifact for a bucket and
    call it.  ``encode(params, sup_ims)`` -> cached support features;
    ``__call__(params, im, info, feats)`` -> (dets, valid)."""

    def __init__(self, out_dir):
        with open(os.path.join(out_dir, 'meta.json')) as f:
            self.meta = json.load(f)
        self._encode = _load(os.path.join(out_dir,
                                          'encode_supports.shlo'))
        self._predict = {}
        for row in self.meta['buckets']:
            self._predict[tuple(row['bucket'])] = _load(
                os.path.join(out_dir, row['file']))

    def encode(self, params, sup_ims):
        return self._encode.call(params, sup_ims)

    def buckets(self):
        return sorted(self._predict)

    def __call__(self, params, im_data, im_info, sup_feat, sup_pooled):
        hw = (im_data.shape[1], im_data.shape[2])
        if self.meta['s2d']:
            hw = ((hw[0] - 3) * 2, (hw[1] - 3) * 2)
        fn = self._predict[hw]
        return fn.call(params, im_data, im_info, sup_feat, sup_pooled)


def _load(path):
    with open(path, 'rb') as f:
        return jax_export.deserialize(f.read())


def load(out_dir) -> Predictor:
    return Predictor(out_dir)
