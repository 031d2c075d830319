"""Preemption guard: first SIGTERM requests a checkpoint, second kills."""

import signal
import sys
import os.path as osp

import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def test_preemption_guard_flow():
    from train import PreemptionGuard
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    try:
        g = PreemptionGuard().install()
        assert not g.requested
        signal.raise_signal(signal.SIGTERM)
        assert g.requested                      # graceful: flag only
        with pytest.raises(KeyboardInterrupt):  # second signal escalates
            signal.raise_signal(signal.SIGTERM)
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)
