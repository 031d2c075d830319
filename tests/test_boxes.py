import numpy as np
import jax.numpy as jnp

from dana_tpu.core import boxes as B


def _rand_boxes(rng, n, hi=200):
    x1 = rng.uniform(0, hi, n)
    y1 = rng.uniform(0, hi, n)
    w = rng.uniform(1, hi, n)
    h = rng.uniform(1, hi, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def _ref_encode(ex, gt):
    ew = ex[:, 2] - ex[:, 0] + 1.0
    eh = ex[:, 3] - ex[:, 1] + 1.0
    ecx = ex[:, 0] + 0.5 * ew
    ecy = ex[:, 1] + 0.5 * eh
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    return np.stack([(gcx - ecx) / ew, (gcy - ecy) / eh,
                     np.log(gw / ew), np.log(gh / eh)], axis=1)


def test_encode_matches_reference_formula():
    rng = np.random.RandomState(0)
    ex, gt = _rand_boxes(rng, 64), _rand_boxes(rng, 64)
    got = np.asarray(B.encode_boxes(jnp.asarray(ex), jnp.asarray(gt)))
    np.testing.assert_allclose(got, _ref_encode(ex, gt), rtol=1e-3, atol=1e-4)


def test_decode_inverts_encode():
    # The reference decode (bbox_transform_inv) computes x2 = cx + 0.5*w,
    # which under the +1 width convention lands on gt_x2 + 1 (and same for
    # y2). We reproduce that exactly.
    rng = np.random.RandomState(1)
    ex, gt = _rand_boxes(rng, 64), _rand_boxes(rng, 64)
    deltas = B.encode_boxes(jnp.asarray(ex), jnp.asarray(gt))
    rec = np.asarray(B.decode_boxes(jnp.asarray(ex), deltas))
    np.testing.assert_allclose(rec[:, :2], gt[:, :2], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(rec[:, 2:], gt[:, 2:] + 1.0, rtol=1e-4, atol=1e-2)


def test_decode_batched_multiclass():
    rng = np.random.RandomState(2)
    ex = _rand_boxes(rng, 8).reshape(2, 4, 4)
    deltas = rng.randn(2, 4, 8).astype(np.float32) * 0.1
    out = np.asarray(B.decode_boxes(jnp.asarray(ex), jnp.asarray(deltas)))
    assert out.shape == (2, 4, 8)
    # class 0 slice equals single-class decode
    out0 = np.asarray(B.decode_boxes(jnp.asarray(ex), jnp.asarray(deltas[..., 0:4])))
    np.testing.assert_allclose(out[..., 0:4], out0, rtol=1e-5)


def test_clip_boxes():
    b = jnp.asarray([[[-10., -5., 1200., 700.]]])
    out = np.asarray(B.clip_boxes(b, jnp.asarray([[600., 1000.]])))
    np.testing.assert_allclose(out[0, 0], [0., 0., 999., 599.])


def test_iou_identity_and_disjoint():
    a = jnp.asarray([[0., 0., 9., 9.], [20., 20., 29., 29.]])
    m = np.asarray(B.iou_matrix(a, a))
    np.testing.assert_allclose(np.diag(m), [1.0, 1.0])
    assert m[0, 1] == 0.0


def test_iou_plus_one_convention():
    # 10x10 boxes (0..9) overlapping by a 5x10 strip: inter=50, union=150
    a = jnp.asarray([[0., 0., 9., 9.]])
    b = jnp.asarray([[5., 0., 14., 9.]])
    m = np.asarray(B.iou_matrix(a, b))
    np.testing.assert_allclose(m[0, 0], 50.0 / 150.0)


def test_iou_masked_padded_gt_and_crowd_anchor():
    anchors = jnp.asarray([[0., 0., 9., 9.], [3., 3., 3., 3.]])  # 2nd zero-area
    gt = jnp.asarray([[0., 0., 9., 9., 1.], [0., 0., 0., 0., 0.]])  # 2nd padded
    m = np.asarray(B.iou_matrix_masked(anchors, gt))
    assert m[0, 0] == 1.0
    assert m[0, 1] == 0.0       # padded gt -> 0
    assert m[1, 0] == -1.0      # zero-area anchor -> -1
    # reference applies the gt mask first, then the anchor mask
    # (bbox_transform.py:212-213), so the anchor -1 wins on the overlap
    assert m[1, 1] == -1.0


def test_iou_masked_batch_shape():
    rng = np.random.RandomState(3)
    anchors = jnp.asarray(_rand_boxes(rng, 10))
    gt = jnp.asarray(np.concatenate([_rand_boxes(rng, 6), np.ones((6, 1))], 1)
                     .reshape(2, 3, 5))
    m = B.iou_matrix_masked(anchors[None].repeat(2, 0), gt)
    assert m.shape == (2, 10, 3)
