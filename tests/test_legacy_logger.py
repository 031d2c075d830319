"""Legacy Logger surface (reference lib/model/utils/logger.py:11-71)."""

import numpy as np


def test_legacy_logger_surface(tmp_path):
    from dana_tpu.utils.legacy_logger import Logger
    lg = Logger(str(tmp_path / 'tb'))
    lg.scalar_summary('loss', 0.5, 1)
    lg.image_summary('imgs', [np.zeros((8, 8, 3), np.uint8),
                              np.linspace(0, 1, 64).reshape(8, 8)], 1)
    lg.histo_summary('weights', np.random.default_rng(0).normal(size=100),
                     1, bins=10)
    kinds = {k for _, k, _, _ in lg.events}
    assert kinds == {'scalar', 'image', 'histogram'}
    tags = [t for _, k, t, _ in lg.events if k == 'image']
    assert tags == ['imgs/0', 'imgs/1']
    counts, edges = [p for _, k, _, p in lg.events
                     if k == 'histogram'][0]
    assert counts.sum() == 100 and len(edges) == 11
