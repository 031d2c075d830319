"""Multi-process (multi-host) execution path.

The reference has no cross-host story at all (single-process
nn.DataParallel, reference train.py:104-105); SURVEY §2.7 names DCN
scale-out as its TPU-native replacement.  These tests prove the
process-level half: a REAL 2-process x 4-CPU-device run (subprocess
pair, gloo collectives, coordinator on localhost) where each process
loads only its batch rows, assembles global arrays via
make_array_from_process_local_data, and reproduces the single-process
8-device train step bit-for-bit at equal global batch.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
HARNESS = osp.join(ROOT, 'tools', 'dist_train_check.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_harness(extra, log_path, harness=HARNESS):
    """Child stdout goes to a FILE, not a pipe: reading pipes
    sequentially can deadlock — a rank blocked writing to a full pipe
    buffer cannot finish the collective, so its peer never exits."""
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)          # harness sets its own device count
    log = open(log_path, 'w+')
    p = subprocess.Popen(
        [sys.executable, harness] + extra,
        env=env, stdout=log, stderr=subprocess.STDOUT,
        cwd=ROOT, text=True)
    p._log = log
    return p


def _wait(p, timeout=1500):
    p.wait(timeout=timeout)
    p._log.seek(0)
    out = p._log.read()
    p._log.close()
    return out


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    """2 processes x 4 devices (gloo) == 1 process x 8 devices: same
    global batch, same loss metrics, same updated params."""
    port = _free_port()
    out_pair = str(tmp_path / 'pair.json')
    out_single = str(tmp_path / 'single.json')

    procs = [
        _run_harness(['--procs', '2', '--rank', str(r),
                      '--coordinator', f'localhost:{port}',
                      '--local_devices', '4',
                      '--out', out_pair],
                     str(tmp_path / f'rank{r}.log'))
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout = _wait(p)
        outs.append(stdout)
        assert p.returncode == 0, f'rank failed:\n{stdout[-4000:]}'
    assert osp.exists(out_pair), f'rank 0 wrote nothing:\n{outs[0][-2000:]}'

    p = _run_harness(['--procs', '1', '--local_devices', '8',
                      '--out', out_single], str(tmp_path / 'single.log'))
    stdout = _wait(p)
    assert p.returncode == 0, f'single-process run failed:\n{stdout[-4000:]}'

    with open(out_pair) as f:
        pair = json.load(f)
    with open(out_single) as f:
        single = json.load(f)
    assert set(pair['metrics']) == set(single['metrics'])
    for k in single['metrics']:
        np.testing.assert_allclose(
            pair['metrics'][k], single['metrics'][k], rtol=1e-4,
            atol=1e-5, err_msg=f'metric {k} diverged across process '
                               f'topologies')
    np.testing.assert_allclose(pair['param_abs_sum'],
                               single['param_abs_sum'], rtol=1e-6)


def test_local_rows_partition():
    """local_rows tiles the global batch exactly: contiguous, disjoint,
    rank-ordered, covering."""
    from dana_tpu.parallel.distributed import local_rows
    got = [local_rows(8, process_id=r, process_count=2) for r in (0, 1)]
    assert got == [slice(0, 4), slice(4, 8)]
    covered = np.concatenate([np.arange(8)[s] for s in got])
    np.testing.assert_array_equal(covered, np.arange(8))
    with pytest.raises(ValueError, match='divide evenly'):
        local_rows(7, process_id=0, process_count=2)


def test_episodic_batcher_process_slices_reassemble():
    """Per-rank EpisodicBatcher slices concatenate (in rank order) to
    exactly the single-process batches — the loader-side contract the
    distributed path rests on."""
    from dana_tpu.data.fs_loader import EpisodicBatcher

    class FakeLoader:
        def __init__(self, n):
            self.n = n

        def valid_indices(self):
            return list(range(self.n))

        def bucket_of(self, i):
            return 0

        def __getitem__(self, i):
            return {'x': np.full((2, 2), i, np.float32)}

    single = list(EpisodicBatcher(FakeLoader(16), 4, seed=3))
    ranks = [list(EpisodicBatcher(FakeLoader(16), 4, seed=3,
                                  process_id=r, process_count=2))
             for r in (0, 1)]
    assert len(single) == len(ranks[0]) == len(ranks[1])
    for sb, r0, r1 in zip(single, *ranks):
        np.testing.assert_array_equal(
            sb['x'], np.concatenate([r0['x'], r1['x']]))
    with pytest.raises(ValueError, match='divide evenly'):
        EpisodicBatcher(FakeLoader(16), 5, process_count=2)


def test_episodic_batcher_short_bucket_fills_batch():
    """A bucket SMALLER than the batch (drop_last=False) must still yield
    FULL batches: the wrap-around pad cycles the bucket, so per-rank row
    blocks stay equal — a short batch would give ranks unequal (or empty)
    shards under make_array_from_process_local_data."""
    from dana_tpu.data.fs_loader import EpisodicBatcher

    class FakeLoader:
        def __init__(self, n):
            self.n = n

        def valid_indices(self):
            return list(range(self.n))

        def bucket_of(self, i):
            return 0

        def __getitem__(self, i):
            return {'x': np.full((2, 2), i, np.float32)}

    for n in (1, 3, 5):
        # drop_last=False is the path under test: the default (True)
        # silently drops the short bucket, leaving zero batches and a
        # vacuous loop (advisor r4)
        single = list(EpisodicBatcher(FakeLoader(n), 8, seed=0,
                                      drop_last=False))
        assert len(single) == 1
        assert all(b['x'].shape[0] == 8 for b in single)
        ranks = [list(EpisodicBatcher(FakeLoader(n), 8, seed=0,
                                      drop_last=False,
                                      process_id=r, process_count=2))
                 for r in (0, 1)]
        assert len(ranks[0]) == len(ranks[1]) == 1
        for sb, r0, r1 in zip(single, *ranks):
            assert r0['x'].shape[0] == r1['x'].shape[0] == 4
            np.testing.assert_array_equal(
                sb['x'], np.concatenate([r0['x'], r1['x']]))


def test_episodic_batcher_workers_deterministic():
    """num_workers must never change WHAT is produced: the same seed
    yields bit-identical batch sequences at 0, 2 and 4 workers, and the
    per-rank row blocks still reassemble the single-process batches
    (replaces the reference's 8-process DataLoader, train.py:57-59)."""
    from dana_tpu.data.fs_loader import EpisodicBatcher

    class FakeLoader:
        def __init__(self, n):
            self.n = n

        def valid_indices(self):
            return list(range(self.n))

        def bucket_of(self, i):
            return i % 2

        def __getitem__(self, i):
            # deterministic in the index, like FewShotLoader's
            # default_rng((seed, index)) episodes
            rng = np.random.default_rng((7, i))
            return {'x': rng.normal(size=(3, 3)).astype(np.float32),
                    'i': np.int32(i)}

    base = list(EpisodicBatcher(FakeLoader(32), 4, seed=5))
    assert len(base) == 8
    for nw in (2, 4):
        got = list(EpisodicBatcher(FakeLoader(32), 4, seed=5,
                                   num_workers=nw))
        assert len(got) == len(base)
        for b, g in zip(base, got):
            np.testing.assert_array_equal(b['x'], g['x'])
            np.testing.assert_array_equal(b['i'], g['i'])
    # workers x multi-process: each rank's row block is unchanged
    ranks = [list(EpisodicBatcher(FakeLoader(32), 4, seed=5,
                                  num_workers=3,
                                  process_id=r, process_count=2))
             for r in (0, 1)]
    for sb, r0, r1 in zip(base, *ranks):
        np.testing.assert_array_equal(
            sb['x'], np.concatenate([r0['x'], r1['x']]))


def test_episodic_batcher_workers_abandoned_mid_epoch():
    """Abandoning the iterator mid-epoch (preemption) must not hang on
    in-flight worker futures."""
    from dana_tpu.data.fs_loader import EpisodicBatcher

    class FakeLoader:
        def valid_indices(self):
            return list(range(16))

        def bucket_of(self, i):
            return 0

        def __getitem__(self, i):
            return {'x': np.full((2,), i, np.float32)}

    b = EpisodicBatcher(FakeLoader(), 4, seed=0, num_workers=2)
    it = iter(b)
    next(it)
    it.close()   # GeneratorExit -> executor shutdown(cancel_futures)
    # a fresh epoch still works after the abandoned one
    assert len(list(iter(b))) == 4


def test_agree_stop_single_process_passthrough():
    """agree_stop degrades to the local flag when single-process (the
    multi-process vote is exercised by the 2-process harnesses)."""
    from dana_tpu.parallel.distributed import agree_stop
    assert agree_stop(True) is True
    assert agree_stop(False) is False


EVAL_HARNESS = osp.join(ROOT, 'tools', 'dist_eval_check.py')


@pytest.mark.slow
def test_two_process_eval_matches_single_process(tmp_path, monkeypatch):
    """inference.py --dist: a 2-process x 4-device pair (disjoint strided
    chunk split, per-rank local meshes, chief-side partial merge) yields
    the same detections as a 1-process x 8-device --mGPUs run."""
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))

    # single-process reference run — also pre-generates the synth
    # dataset the pair's subprocesses will share via DANA_SYNTH_ROOT
    sys.path.insert(0, ROOT)
    import inference as inference_cli
    from tests.test_inference_cli import (BASE_ARGS,
                                          _assert_detections_match)
    out_single = str(tmp_path / 'eval_single')
    inference_cli.main(BASE_ARGS + ['--bs', '4', '--mGPUs',
                                    '--eval_dir', out_single])

    port = _free_port()
    out_pair = str(tmp_path / 'eval_pair')
    procs = [
        _run_harness(['--rank', str(r), '--procs', '2',
                      '--coordinator', f'localhost:{port}',
                      '--eval_dir', out_pair, '--bs', '4'],
                     str(tmp_path / f'eval_rank{r}.log'),
                     harness=EVAL_HARNESS)
        for r in (0, 1)
    ]
    for r, p in enumerate(procs):
        stdout = _wait(p)
        assert p.returncode == 0, f'rank {r} failed:\n{stdout[-4000:]}'
    assert osp.exists(osp.join(out_pair, 'detections.pkl'))
    # rank partials were written and merged
    assert osp.exists(osp.join(out_pair, 'detections_rank1.pkl'))

    _assert_detections_match(out_single, out_pair)
