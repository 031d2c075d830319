"""Per-stage precision islands (DanaConfig.attention_dtype/head_dtype).

The TPU serving recipe is bf16 trunk + f32 head: pure bf16 on an
f32-trained checkpoint drops synth AP 0.175->0.119 while an f32 HEAD
island alone recovers it exactly at +4.7% forward cost (PERF.md "bf16
compute and AP").  These tests pin the mechanics on CPU: island configs
run and emit f32 outputs, the f32-head island tracks the all-f32
reference closely (much closer than pure bf16), and the cfg plumbing
maps TPU.{ATTENTION,HEAD}_DTYPE onto the model config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp

COMMON = dict(n_way=2, n_shot=2, train_pre_nms=200, train_post_nms=32,
              test_pre_nms=200, test_post_nms=16, nms_cap=200,
              rois_per_image=16, rpn_batchsize=32)


def _data():
    rng = np.random.default_rng(3)
    im = jnp.asarray(rng.normal(size=(1, 128, 160, 3)) * 30, jnp.float32)
    info = jnp.array([[128.0, 160.0, 1.0]])
    sup = jnp.asarray(rng.normal(size=(1, 2, 320, 320, 3)) * 30,
                      jnp.float32)
    return im, info, sup


def _fwd(config, params, im, info, sup):
    out = dana.forward(params, config, im, info, sup, training=False)
    return np.asarray(out['cls_prob'], np.float32), \
        np.asarray(out['bbox_pred'], np.float32)


def test_island_forward_dtypes():
    base = dana.DanaConfig(compute_dtype=jnp.float32, **COMMON)
    params = to_jnp(dana.init_params(base, seed=0))
    im, info, sup = _data()

    isl = dataclasses.replace(base, compute_dtype=jnp.bfloat16,
                              head_dtype=jnp.float32)
    out = dana.forward(params, isl, im, info, sup, training=False)
    # head island -> head outputs are full-precision tensors
    assert out['cls_prob'].dtype == jnp.float32
    assert out['bbox_pred'].dtype == jnp.float32
    assert np.isfinite(np.asarray(out['bbox_pred'], np.float32)).all()


def test_head_island_matches_f32_head():
    """rcnn_head with f32 attention+head islands is EXACT vs all-f32.

    Probed directly at the head (the forward-level comparison is
    confounded by proposal selection under a bf16 trunk): same f32
    pooled/support inputs, island config flags bf16 compute, but every
    op the islands cover runs f32 -> bitwise-equal head outputs."""
    f32 = dana.DanaConfig(compute_dtype=jnp.float32, **COMMON)
    isl = dataclasses.replace(f32, compute_dtype=jnp.bfloat16,
                              attention_dtype=jnp.float32,
                              head_dtype=jnp.float32)
    params = to_jnp(dana.init_params(f32, seed=0))
    rng = np.random.default_rng(7)
    b, r, p, c = 1, 16, f32.pooling_size, f32.feat_dim
    pooled = jnp.asarray(rng.normal(size=(b, r, p, p, c)), jnp.float32)
    sup = jnp.asarray(rng.normal(size=(b, f32.n_shot, p, p, c)),
                      jnp.float32)
    pe = jnp.asarray(
        dana.positional_encoding(p * p, c), jnp.float32)
    ref = dana.rcnn_head(params, f32, pooled, sup, pe)
    got = dana.rcnn_head(params, isl, pooled, sup, pe)
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b_, np.float32))


def test_bf16_head_differs_f32_head_tracks():
    """With a bf16 head the outputs move; the f32 head island pins them.

    Uses fixed inputs so the comparison isolates head precision."""
    f32 = dana.DanaConfig(compute_dtype=jnp.float32, **COMMON)
    isl = dataclasses.replace(f32, compute_dtype=jnp.bfloat16,
                              head_dtype=jnp.float32)
    raw = dataclasses.replace(f32, compute_dtype=jnp.bfloat16)
    params = to_jnp(dana.init_params(f32, seed=0))
    rng = np.random.default_rng(11)
    b, r, p, c = 1, 16, f32.pooling_size, f32.feat_dim
    pooled = jnp.asarray(rng.normal(size=(b, r, p, p, c)), jnp.float32)
    sup = jnp.asarray(rng.normal(size=(b, f32.n_shot, p, p, c)),
                      jnp.float32)
    pe = jnp.asarray(dana.positional_encoding(p * p, c), jnp.float32)
    ref_box = np.asarray(dana.rcnn_head(params, f32, pooled, sup, pe)[0],
                         np.float32)
    isl_box = np.asarray(dana.rcnn_head(params, isl, pooled, sup, pe)[0],
                         np.float32)
    raw_box = np.asarray(dana.rcnn_head(params, raw, pooled, sup, pe)[0],
                         np.float32)
    err_isl = float(np.abs(isl_box - ref_box).mean())
    err_raw = float(np.abs(raw_box - ref_box).mean())
    # bbox deltas through an f32 head track f32 tighter than bf16 does
    assert err_isl < err_raw


def test_attention_island_runs():
    cfg = dana.DanaConfig(compute_dtype=jnp.bfloat16,
                          attention_dtype=jnp.float32,
                          head_dtype=jnp.float32, **COMMON)
    params = to_jnp(dana.init_params(cfg, seed=0))
    im, info, sup = _data()
    cls, box = _fwd(cfg, params, im, info, sup)
    assert np.isfinite(cls).all() and np.isfinite(box).all()


def test_cfg_plumbing(monkeypatch):
    from dana_tpu.utils.config import cfg
    import utils as cli_utils
    # defaults: HEAD_DTYPE f32 (AP-safe under bf16), attention follows
    assert cfg.TPU.HEAD_DTYPE == 'float32'
    kw = cli_utils.model_config_kwargs(2, 2)
    assert kw['head_dtype'] == jnp.float32
    assert kw['attention_dtype'] is None
    monkeypatch.setitem(cfg.TPU, 'HEAD_DTYPE', '')
    monkeypatch.setitem(cfg.TPU, 'ATTENTION_DTYPE', 'bfloat16')
    kw = cli_utils.model_config_kwargs(2, 2)
    assert kw['head_dtype'] is None
    assert kw['attention_dtype'] == jnp.bfloat16


def test_island_properties_resolve():
    c = dana.DanaConfig(compute_dtype=jnp.bfloat16, **COMMON)
    assert c.attention_dt == jnp.bfloat16 and c.head_dt == jnp.bfloat16
    c = dataclasses.replace(c, head_dtype=jnp.float32)
    assert c.head_dt == jnp.float32 and c.attention_dt == jnp.bfloat16


@pytest.mark.parametrize('name', ['fsod', 'meta', 'fgn', 'frcnn'])
def test_sibling_framework_islands(name):
    """Every framework honors the f32 head island under bf16 compute
    (frameworks.trunk/_finish_episodic boundaries)."""
    from dana_tpu.models import frameworks as fw
    cfgd = dict(COMMON, compute_dtype=jnp.bfloat16,
                head_dtype=jnp.float32)
    config, params = fw.get_model(name, cfgd, seed=0)
    rng = np.random.default_rng(13)
    im = jnp.asarray(rng.normal(size=(1, 128, 160, 3)) * 30, jnp.float32)
    info = jnp.array([[128.0, 160.0, 1.0]])
    sup = jnp.asarray(rng.normal(size=(1, 2, 320, 320, 3)) * 30,
                      jnp.float32)
    if name == 'frcnn':
        out = fw.frcnn_forward(params, config, im, info, training=False)
    else:
        out = fw.forward_fn(name)(params, config, im, info, sup,
                                  training=False)
    assert out['cls_prob'].dtype == jnp.float32
    assert out['bbox_pred'].dtype == jnp.float32
    assert np.isfinite(np.asarray(out['cls_prob'], np.float32)).all()
