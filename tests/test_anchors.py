import numpy as np

from dana_tpu.core.anchors import generate_anchors, shifted_anchors

# Golden values produced by EXECUTING the reference's generate_anchors()
# under python3/numpy (the table in its comments, generate_anchors.py:29-37,
# is the older MATLAB variant offset by 1; trained checkpoints saw these).
GOLDEN_9 = np.array([
    [-84., -40., 99., 55.],
    [-176., -88., 191., 103.],
    [-360., -184., 375., 199.],
    [-56., -56., 71., 71.],
    [-120., -120., 135., 135.],
    [-248., -248., 263., 263.],
    [-36., -80., 51., 95.],
    [-80., -168., 95., 183.],
    [-168., -344., 183., 359.],
])


def test_generate_anchors_golden():
    a = generate_anchors()
    np.testing.assert_allclose(a, GOLDEN_9)


def test_generate_anchors_4scale():
    a = generate_anchors(scales=np.array([4, 8, 16, 32]))
    assert a.shape == (12, 4)
    # scale-4 square anchor: 64x64 window centered like the base
    np.testing.assert_allclose(a[4], [-24., -24., 39., 39.])


def test_shifted_anchors_order():
    base = generate_anchors()
    grid = np.asarray(shifted_anchors(2, 3, 16, base))
    assert grid.shape == (2 * 3 * 9, 4)
    # first 9 = base anchors at shift (0,0)
    np.testing.assert_allclose(grid[:9], GOLDEN_9)
    # anchor block at shift x=16 (second cell of first row)
    np.testing.assert_allclose(grid[9:18], GOLDEN_9 + np.array([16, 0, 16, 0]))
    # second row: shift y=16
    np.testing.assert_allclose(grid[27:36], GOLDEN_9 + np.array([0, 16, 0, 16]))
