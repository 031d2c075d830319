"""skip_nonfinite failure containment with the trainable-masked
backward (round 3): a NaN batch applies NO update and reports
skipped=1; a clean batch updates trainable leaves only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dana_tpu.engine import optim, train
from dana_tpu.models import dana
from dana_tpu.models.layers import to_jnp

CFG = dana.DanaConfig(n_way=2, n_shot=1, train_pre_nms=100,
                      train_post_nms=16, test_pre_nms=100,
                      test_post_nms=8, nms_cap=100, rois_per_image=8,
                      rpn_batchsize=16)


def _batch(nan=False):
    im = jnp.zeros((1, 64, 96, 3))
    if nan:
        im = im.at[0, 0, 0, 0].set(jnp.nan)
    return {
        'im_data': im,
        'im_info': jnp.array([[64.0, 96.0, 1.0]]),
        'gt_boxes': jnp.array([[[10.0, 10.0, 50.0, 40.0, 1.0],
                                [0.0] * 5]]),
        'support_ims': jnp.zeros((1, 2, 224, 224, 3)),
    }


def test_nan_batch_skips_update_clean_batch_moves_heads():
    params = to_jnp(dana.init_params(CFG, seed=0))
    trainable = optim.trainable_mask(params)
    step = train.make_train_step(CFG, trainable, clip_norm=10.0)
    rng = jax.random.PRNGKey(0)
    state = train.create_train_state(params, 1e-3)

    # NaN input -> loss/grads non-finite -> no update, skipped=1
    new_state, m = step(state, _batch(nan=True), rng)
    assert float(m['skipped']) == 1.0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # clean batch -> update applied, skipped=0, frozen leaves untouched
    new_state, m = step(state, _batch(), rng)
    assert float(m['skipped']) == 0.0
    assert np.isfinite(float(m['loss']))
    moved = frozen_ok = 0
    for a, b, t in zip(jax.tree.leaves(state.params),
                       jax.tree.leaves(new_state.params),
                       jax.tree.leaves(trainable)):
        if t:
            moved += int(not np.array_equal(np.asarray(a), np.asarray(b)))
        else:
            frozen_ok += int(np.array_equal(np.asarray(a), np.asarray(b)))
            assert np.array_equal(np.asarray(a), np.asarray(b))
    assert moved > 0
    assert frozen_ok > 0
