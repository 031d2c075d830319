"""Pallas RoIAlign kernel parity vs the XLA implementation (interpret
mode on CPU; hardware parity was verified on v5e — see module STATUS)."""

import jax
import jax.numpy as jnp
import numpy as np

from dana_tpu.ops.roi_align import roi_align
from dana_tpu.ops.roi_align_pallas import roi_align_pallas


def test_pallas_matches_xla():
    key = jax.random.PRNGKey(0)
    feat = jax.random.normal(key, (2, 10, 12, 8))
    xy = jax.random.uniform(key, (2, 9, 2)) * 100
    wh = jax.random.uniform(key, (2, 9, 2)) * 60 + 10
    rois = jnp.concatenate([xy, xy + wh], axis=-1)
    ref = np.asarray(roi_align(feat, rois, 7, 1 / 16.0, 0))
    got = np.asarray(roi_align_pallas(feat, rois, 7, 1 / 16.0, 0,
                                      roi_block=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_roi_padding():
    # roi count not a multiple of roi_block exercises the pad/slice path
    key = jax.random.PRNGKey(1)
    feat = jax.random.normal(key, (1, 8, 8, 4))
    xy = jax.random.uniform(key, (1, 5, 2)) * 60
    wh = jax.random.uniform(key, (1, 5, 2)) * 40 + 10
    rois = jnp.concatenate([xy, xy + wh], axis=-1)
    ref = np.asarray(roi_align(feat, rois, 5, 1 / 16.0, 0))
    got = np.asarray(roi_align_pallas(feat, rois, 5, 1 / 16.0, 0,
                                      roi_block=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_pw_matches_xla():
    """Precomputed-weights variant (pooled axis zero-padded to 8 for the
    Mosaic (RB,P)->RB*P collapse — see module docstring)."""
    from dana_tpu.ops.roi_align_pallas import roi_align_pallas_pw
    key = jax.random.PRNGKey(2)
    feat = jax.random.normal(key, (2, 10, 12, 8))
    xy = jax.random.uniform(key, (2, 9, 2)) * 100
    wh = jax.random.uniform(key, (2, 9, 2)) * 60 + 10
    rois = jnp.concatenate([xy, xy + wh], axis=-1)
    ref = np.asarray(roi_align(feat, rois, 7, 1 / 16.0, 0))
    got = np.asarray(roi_align_pallas_pw(feat, rois, 7, 1 / 16.0, 0,
                                         roi_block=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # pooled size above the pad (pp == p branch)
    ref8 = np.asarray(roi_align(feat, rois, 8, 1 / 16.0, 0))
    got8 = np.asarray(roi_align_pallas_pw(feat, rois, 8, 1 / 16.0, 0,
                                          roi_block=4))
    np.testing.assert_allclose(got8, ref8, rtol=1e-5, atol=1e-5)
