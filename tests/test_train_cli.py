"""End-to-end train CLI smoke on the 8-virtual-device CPU mesh.

Drives `train.main` with --mGPUs on the synthetic FSOD set — the
data-parallel path of the reference train loop (train.py:104-105,
138-139) exercised through the real CLI: roidb, episodic loader, sharded
train step, checkpoint save.  Shapes are shrunk via --set overrides so
the CPU compile stays in CI budget.
"""

import os
import os.path as osp
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason='needs multi-device CPU platform')


@pytest.mark.slow
def test_train_cli_preemption_checkpoints_and_rewinds_epoch(tmp_path,
                                                            monkeypatch):
    """A preemption request after the first step writes a checkpoint
    recording the PREVIOUS epoch (so --r re-runs the interrupted one)
    and exits cleanly with the checkpoint path."""
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    save_dir = str(tmp_path / 'run')

    import train as train_cli

    class AlwaysPreempted:
        requested = True

        def install(self):
            return self

    monkeypatch.setattr(train_cli, 'PreemptionGuard', AlwaysPreempted)
    argv = [
        '--dataset', 'synth_test', '--net', 'DAnA', '--backbone', 'res50',
        '--bs', '2', '--epochs', '3', '--way', '2', '--shot', '1',
        '--disp_interval', '1', '--dlog',
        '--save_dir', save_dir, '--seed', '3',
        '--set',
        'TRAIN.SCALES', '(128,)', 'TRAIN.MAX_SIZE', '192',
        'TRAIN.RPN_PRE_NMS_TOP_N', '300', 'TRAIN.RPN_POST_NMS_TOP_N', '48',
        'TRAIN.RPN_BATCHSIZE', '64', 'TRAIN.BATCH_SIZE', '32',
        'TPU.NMS_MAX_INPUT', '300',
        'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
    ]
    path = train_cli.main(argv)
    # one step of epoch 1 ran; the checkpoint rewinds to epoch 0
    assert path is not None and 'model_0_0' in path
    from dana_tpu.utils import checkpoint as ckpt_lib
    payload = ckpt_lib.load_checkpoint(path)
    assert payload['epoch'] == 0
    for leaf in jax.tree.leaves(payload['model']):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # the preemption -> resume loop closes end-to-end: --r restarts at
    # the interrupted epoch 1 and trains it to completion
    monkeypatch.undo()                # restore the real PreemptionGuard
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    resume_argv = argv + ['--r', '--load_dir', save_dir,
                          '--checkepoch', '0', '--checkpoint', '0',
                          '--epochs', '1']
    train_cli.main(resume_argv)
    ckpts = os.listdir(osp.join(save_dir, 'train', 'checkpoints'))
    assert any(c.startswith('model_1_') for c in ckpts), ckpts


@pytest.mark.slow
def test_train_cli_mgpus_smoke(tmp_path, monkeypatch):
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    save_dir = str(tmp_path / 'run')

    import train as train_cli
    argv = [
        # synth_test: 20 images -> 2-3 sharded steps at bs=8 (a 1-core CI
        # box runs each episodic step in ~tens of seconds)
        '--dataset', 'synth_test', '--net', 'DAnA', '--backbone', 'res50',
        '--mGPUs', '--bs', str(len(jax.devices())),
        '--epochs', '1', '--way', '2', '--shot', '1',
        '--disp_interval', '2', '--dlog',
        '--save_dir', save_dir, '--seed', '3',
        '--set',
        'TRAIN.SCALES', '(128,)', 'TRAIN.MAX_SIZE', '192',
        'TRAIN.RPN_PRE_NMS_TOP_N', '300', 'TRAIN.RPN_POST_NMS_TOP_N', '48',
        'TRAIN.RPN_BATCHSIZE', '64', 'TRAIN.BATCH_SIZE', '32',
        'TPU.NMS_MAX_INPUT', '300',
        # static canvas buckets must shrink with the scales or the step
        # compiles/executes on the default 608x1024 canvases
        'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
    ]
    train_cli.main(argv)

    ckpts = os.listdir(osp.join(save_dir, 'train', 'checkpoints'))
    assert any(c.startswith('model_1_') for c in ckpts), ckpts

    # the checkpoint round-trips and its params are finite
    from dana_tpu.utils import checkpoint as ckpt_lib
    path = osp.join(save_dir, 'train', 'checkpoints', sorted(ckpts)[-1])
    payload = ckpt_lib.load_checkpoint(path)
    for leaf in jax.tree.leaves(payload['model']):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_train_cli_slices_shards_batch_over_both_axes(tmp_path,
                                                      monkeypatch):
    """--slices N through the REAL CLI loop: the batch must shard over
    slice x data (advisor r3, high: train.py's loop used to shard over
    'data' alone on the two-level mesh, silently replicating the batch
    per slice — every slice computed identical gradients).  Wraps the
    engine's shard_batch to record the per-device shard rows of every
    batch the loop actually feeds."""
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    save_dir = str(tmp_path / 'run')

    import train as train_cli
    from dana_tpu.engine import train as train_engine

    n = len(jax.devices())
    bs = n                       # 1 row per device iff slice x data works
    seen = []
    orig = train_engine.shard_batch

    def recording(batch, mesh, *a, **kw):
        out = orig(batch, mesh, *a, **kw)
        rows = {s.data.shape[0]
                for s in out['im_data'].addressable_shards}
        seen.append((mesh.axis_names, rows))
        return out

    monkeypatch.setattr(train_engine, 'shard_batch', recording)

    argv = [
        '--dataset', 'synth_test', '--net', 'DAnA', '--backbone', 'res50',
        '--slices', '2', '--bs', str(bs),
        '--epochs', '1', '--way', '2', '--shot', '1',
        '--disp_interval', '2', '--dlog',
        '--save_dir', save_dir, '--seed', '3',
        '--set',
        'TRAIN.SCALES', '(128,)', 'TRAIN.MAX_SIZE', '192',
        'TRAIN.RPN_PRE_NMS_TOP_N', '300', 'TRAIN.RPN_POST_NMS_TOP_N', '48',
        'TRAIN.RPN_BATCHSIZE', '64', 'TRAIN.BATCH_SIZE', '32',
        'TPU.NMS_MAX_INPUT', '300',
        'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
    ]
    train_cli.main(argv)

    assert seen, 'shard_batch never called through the --slices loop'
    for axis_names, rows in seen:
        assert 'slice' in axis_names and 'data' in axis_names
        assert rows == {bs // n}, (
            f'per-device rows {rows}: batch replicated across slices '
            f'instead of sharding slice x data')
