"""End-to-end inference CLI smoke on CPU.

Drives `inference.main` over the synthetic test split with shrunken
shapes: roidb -> bucketed batches -> cached support features -> jitted
predict+postprocess (with the threaded host-assembly pipeline) ->
pickled all_boxes -> COCOeval.  Parity surface:
/root/reference/inference.py:25-181.
"""

import os.path as osp
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def test_inference_cli_smoke(tmp_path, monkeypatch):
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    out_dir = str(tmp_path / 'eval')

    import inference as inference_cli
    argv = [
        '--dataset', 'synth', '--net', 'DAnA', '--backbone', 'res50',
        '--bs', '4', '--way', '1', '--shot', '1',
        '--eval_dir', out_dir, '--seed', '5',
        '--set',
        'TEST.SCALES', '(128,)', 'TEST.MAX_SIZE', '192',
        'TEST.RPN_PRE_NMS_TOP_N', '300', 'TEST.RPN_POST_NMS_TOP_N', '32',
        'TPU.NMS_MAX_INPUT', '300',
        'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
    ]
    result = inference_cli.main(argv)

    # COCOeval stats came back finite (random init -> AP ~ 0)
    assert result is not None
    with open(osp.join(out_dir, 'detections.pkl'), 'rb') as f:
        all_boxes = pickle.load(f)
    # every (class, image) cell filled with an array (possibly empty)
    n_imgs = len(all_boxes[0])
    assert n_imgs == 20
    filled = sum(1 for c in all_boxes for d in c
                 if isinstance(d, np.ndarray))
    assert filled >= n_imgs   # at least each image's target class
    for c in all_boxes:
        for d in c:
            if isinstance(d, np.ndarray) and len(d):
                assert d.shape[1] == 5
                assert np.all(np.isfinite(d))


BASE_ARGS = [
    '--dataset', 'synth', '--net', 'DAnA', '--backbone', 'res50',
    '--way', '1', '--shot', '1', '--seed', '5',
    '--set',
    'TEST.SCALES', '(128,)', 'TEST.MAX_SIZE', '192',
    'TEST.RPN_PRE_NMS_TOP_N', '300', 'TEST.RPN_POST_NMS_TOP_N', '32',
    'TPU.NMS_MAX_INPUT', '300',
    'TPU.SIZE_BUCKETS', '[(128, 192), (192, 128), (160, 160)]',
]


def _assert_detections_match(path_a, path_b, coord_atol=1e-4):
    """Compare two detections.pkl up to equal-score tie permutation.

    Random-init params produce many detections with IDENTICAL scores
    (saturated softmax); among equal-score boxes the kept set after NMS
    depends on tie order, which differs between compiled programs of
    different batch/mesh shapes.  The well-defined invariant is: same
    per-cell count, same score multiset, and identical boxes for every
    score that is unique within its cell.

    coord_atol is the box-coordinate budget in PIXELS.  dp/tp runs are
    held to 1e-4 px; the --sp run gets 0.02 px: GSPMD's spatially-
    partitioned convs insert halo exchanges and retile the contraction,
    which reassociates the float reductions — a different-but-valid fp
    summation order, not a bug (root-caused r3->r4: drift measured at
    1.3e-3 px on a 128px image, growing with conv depth).  0.02 px is
    ~60x that observed drift yet 50x below COCOeval's finest IoU
    sensitivity at these box sizes, so any real regression still trips."""
    with open(osp.join(path_a, 'detections.pkl'), 'rb') as f:
        a = pickle.load(f)
    with open(osp.join(path_b, 'detections.pkl'), 'rb') as f:
        b = pickle.load(f)
    for ca, cb in zip(a, b):
        for da, db in zip(ca, cb):
            da = np.asarray(da) if isinstance(da, np.ndarray) else None
            db = np.asarray(db) if isinstance(db, np.ndarray) else None
            assert (da is None) == (db is None)
            if da is None or not len(da):
                continue
            assert da.shape == db.shape
            sa, sb = np.sort(da[:, 4]), np.sort(db[:, 4])
            np.testing.assert_allclose(sa, sb, rtol=1e-4, atol=1e-4)
            # unique-score rows must agree exactly (modulo fp tolerance)
            qa = np.round(da[:, 4], 3)
            uniq, cnt = np.unique(qa, return_counts=True)
            for s in uniq[cnt == 1]:
                ra = da[qa == s]
                rb = db[np.round(db[:, 4], 3) == s]
                if len(rb) == 1:
                    np.testing.assert_allclose(
                        ra[:, :4], rb[:, :4], rtol=1e-4, atol=coord_atol)
                    np.testing.assert_allclose(
                        ra[:, 4], rb[:, 4], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_inference_cli_mgpus_matches_single(tmp_path, monkeypatch):
    """--mGPUs data-parallel eval (batch sharded over the CPU mesh)
    produces the same detections as the single-device run."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip('needs multi-device CPU platform')
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))

    import inference as inference_cli
    out1 = str(tmp_path / 'eval1')
    inference_cli.main(BASE_ARGS + ['--bs', '4', '--eval_dir', out1])
    out2 = str(tmp_path / 'eval2')
    inference_cli.main(BASE_ARGS + ['--bs', '4', '--eval_dir', out2,
                                    '--mGPUs'])
    _assert_detections_match(out1, out2)


@pytest.mark.slow
def test_inference_cli_tp_matches_single(tmp_path, monkeypatch):
    """--tp 2 latency-mode eval (projection weights column-sharded over
    the mesh 'model' axis, inference.py --tp) produces the same
    detections as the single-device run."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip('needs multi-device CPU platform')
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))

    import inference as inference_cli
    out1 = str(tmp_path / 'eval1')
    inference_cli.main(BASE_ARGS + ['--bs', '4', '--eval_dir', out1])
    out2 = str(tmp_path / 'eval2')
    inference_cli.main(BASE_ARGS + ['--bs', '4', '--eval_dir', out2,
                                    '--tp', '2'])
    _assert_detections_match(out1, out2)


@pytest.mark.slow
def test_inference_cli_sp_matches_single(tmp_path, monkeypatch):
    """--sp 2 spatial-partitioned eval (each query's H axis sharded over
    the mesh 'model' axis; GSPMD inserts the conv halo exchanges,
    inference.py --sp) produces the same detections as the
    single-device run."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip('needs multi-device CPU platform')
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))

    import inference as inference_cli
    out1 = str(tmp_path / 'eval1')
    inference_cli.main(BASE_ARGS + ['--bs', '4', '--eval_dir', out1])
    out2 = str(tmp_path / 'eval2')
    inference_cli.main(BASE_ARGS + ['--bs', '4', '--eval_dir', out2,
                                    '--sp', '2'])
    # 0.02 px coordinate budget for SP — see _assert_detections_match:
    # halo-exchange conv partitioning legitimately reassociates float
    # reductions; observed drift 1.3e-3 px, budget 60x that and still
    # 50x below AP-relevant magnitude
    _assert_detections_match(out1, out2, coord_atol=0.02)


def test_inference_cli_tp_sp_mutually_exclusive(tmp_path, monkeypatch):
    """--tp and --sp both claim the mesh 'model' axis: combining them
    must fail loudly, not silently pick one."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip('needs multi-device CPU platform')
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    import inference as inference_cli
    with pytest.raises(SystemExit):
        inference_cli.main(BASE_ARGS + ['--bs', '4', '--tp', '2',
                                        '--sp', '2'])


@pytest.mark.slow
def test_inference_cli_tp_int8_combo(tmp_path, monkeypatch):
    """--tp 2 composes with the int8 PTQ serving path (int8 leaves are
    replicated; only f32 'weight' leaves column-shard)."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip('needs multi-device CPU platform')
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))

    import inference as inference_cli
    out = str(tmp_path / 'evalq')
    cut = BASE_ARGS.index('--set')     # flags must precede the --set list
    result = inference_cli.main(
        BASE_ARGS[:cut] + ['--bs', '4', '--eval_dir', out, '--tp', '2']
        + BASE_ARGS[cut:] + ['TPU.QUANT_INT8', 'True'])
    assert result is not None
    with open(osp.join(out, 'detections.pkl'), 'rb') as f:
        boxes = pickle.load(f)
    filled = sum(1 for c in boxes for d in c
                 if isinstance(d, np.ndarray) and len(d))
    assert filled > 0
