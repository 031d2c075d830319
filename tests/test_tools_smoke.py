"""Smoke tests for tools/ (VERDICT r2 weak #8: keep them from rotting).

TPU-only tools get CPU-runnable dry tiers; heavyweight paths stay
env-gated where a 1-core CPU compile would blow the CI budget.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_bench_coco_eval_quick():
    from tools import bench_coco_eval as bce
    gt, dt, img_ids, cat_ids = bce.synth(30, 4)
    from dana_tpu.eval import coco_eval as ce
    res = ce.evaluate_detections(gt, dt, img_ids=img_ids,
                                 cat_ids=cat_ids)
    assert 0.0 <= res['stats'][0] <= 1.0
    # the r2-baseline matcher used for the speedup claim agrees with the
    # production path on stats-relevant outputs
    cid = cat_ids[0]
    dets = dt.loadAnns(dt.getAnnIds(imgIds=img_ids[0], catIds=[cid]))
    gts = gt.loadAnns(gt.getAnnIds(imgIds=img_ids[0], catIds=[cid]))
    if dets or gts:
        rng = list(ce.AREA_RNG.values())[0]
        a = bce._evaluate_img_r2(dets, gts, rng, 100)
        b = ce._evaluate_img(dets, gts, rng, 100)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_scaling_study_importable_and_shapes():
    from tools import scaling_study
    b = scaling_study._batch(2)
    assert b['im_data'].shape == (2, 64, 96, 3)
    assert b['support_ims'].shape[1] == 4


def test_nms_cap_study_recall_helper():
    from tools.nms_cap_study import proposal_recall
    rois = np.array([[0, 10, 10, 50, 50], [0, 100, 100, 150, 150]],
                    np.float32)
    gts = np.array([[12, 12, 48, 48, 1], [300, 300, 340, 340, 1]],
                   np.float32)
    r = proposal_recall(rois, gts)
    assert r == pytest.approx(0.5)
    assert proposal_recall(rois, gts[:0]) is None


def test_profile_train_masks():
    from tools.profile_train import _mask_from_prefixes, _and_masks
    params = {'backbone': {'layer4': {'w': np.zeros(1)},
                           'layer1': {'w': np.zeros(1)}},
              'RCNN_bbox_pred': {'weight': np.zeros(1)}}
    m = _mask_from_prefixes(params, ['heads', 'backbone.layer4'])
    assert m['backbone']['layer4']['w'] is True
    assert m['backbone']['layer1']['w'] is False
    assert m['RCNN_bbox_pred']['weight'] is True
    both = _and_masks(m, m)
    assert both['backbone']['layer4']['w'] is True


@pytest.mark.skipif(not os.environ.get('DANA_TOOL_SMOKE'),
                    reason='compiles train fwd/bwd stages (~minutes on '
                           '1 CPU core); set DANA_TOOL_SMOKE=1')
def test_profile_train_dry_runs():
    env = dict(os.environ, PROF_DRY='1', PYTHONPATH=REPO,
               JAX_PLATFORMS='cpu')
    env.pop('PYTHONSTARTUP', None)
    out = subprocess.run(
        [sys.executable, osp.join(REPO, 'tools', 'profile_train.py')],
        env=env, capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'frozen-grad saving' in out.stdout


def test_export_serving_cli(tmp_path):
    """tools/export_serving.py: tiny single-bucket export round-trips
    through the CLI path (trace + lower only — no backend compile)."""
    from dana_tpu.models import dana
    from dana_tpu.utils import checkpoint as ckpt_lib
    from tools import export_serving

    cfgm = dana.DanaConfig(n_way=2, n_shot=1)
    params = dana.init_params(cfgm, seed=0)
    ck = str(tmp_path / 'tiny.dkpt')
    ckpt_lib.save_checkpoint(ck, params)
    out = str(tmp_path / 'art')
    export_serving.main(['--checkpath', ck, '--out', out, '--bs', '1',
                         '--way', '2', '--shot', '1',
                         '--buckets', '64x96', '--quant', 'tail'])
    assert os.path.exists(os.path.join(out, 'meta.json'))
    assert os.path.exists(os.path.join(out, 'predict_64x96.shlo'))
    assert os.path.exists(os.path.join(out, 'encode_supports.shlo'))


def test_host_prep_bench_runs(tmp_path, monkeypatch):
    monkeypatch.setenv('DANA_SYNTH_ROOT', str(tmp_path / 'synth'))
    from tools import host_prep_bench
    rows = host_prep_bench.main(n=4)
    assert len(rows) == 2
    (nat, ev_n, tr_n), (raw, ev_np, tr_np) = rows
    assert nat and not raw
    assert ev_n > 0 and tr_n > 0 and ev_np > 0 and tr_np > 0
    # the env A/B switch must be restored
    assert 'DANA_NO_NATIVE' not in os.environ


def test_round4_study_tools_helpers():
    """Pure helpers of the round-4 study tools (import rot guard; the
    heavyweight measure paths run on the TPU box only)."""
    from tools import roi_locality_study as rls
    rois = rls.make_rois('realistic')
    assert rois.shape == (rls.B, rls.R, 4)
    stats = rls.extent_stats(rois)
    assert 0.0 < stats['mean_area_frac'] <= 1.1
    worst = rls.extent_stats(rls.make_rois('worst'))
    assert worst['mean_area_frac'] > stats['mean_area_frac']

    import tools.seed_sweep
    import tools.train_batch_study
    import tools.bs_regress_probe
    import tools.dist_eval_check as dec
    # dist_eval_check's args must stay in sync with the suite's
    # (compile-cache reuse + equality-comparison contract)
    from tests.test_inference_cli import BASE_ARGS
    assert dec.BASE_ARGS == BASE_ARGS


def test_seed_sweep_resume(tmp_path):
    """A killed sweep resumes from the per-seed rows file: rows at the
    wrong epoch count are ignored, later duplicates win, and the
    summary aggregates mean/min/max."""
    import json
    from tools import seed_sweep

    path = tmp_path / 'rows.jsonl'
    rows = [
        {'seed': 0, 'epochs': 600, 'ap': 0.70, 'ap50': 0.90,
         'single_ap': 0.30, 'single_ap50': 0.40},
        {'seed': 1, 'epochs': 300, 'ap': 0.10, 'ap50': 0.10,
         'single_ap': 0.10, 'single_ap50': 0.10},  # other protocol
        {'seed': 0, 'epochs': 600, 'ap': 0.80, 'ap50': 0.96,
         'single_ap': 0.36, 'single_ap50': 0.42},  # re-run wins
    ]
    with open(path, 'w') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')
    done = seed_sweep.load_rows(600, path=str(path))
    assert set(done) == {0}
    assert done[0]['ap'] == 0.80

    summary = seed_sweep.summarize([
        {'ap': 0.7, 'ap50': 0.9, 'single_ap': 0.3, 'single_ap50': 0.4},
        {'ap': 0.8, 'ap50': 1.0, 'single_ap': 0.4, 'single_ap50': 0.5},
    ])
    assert abs(summary['ap']['mean'] - 0.75) < 1e-9
    assert summary['ap50']['min'] == 0.9 and summary['ap50']['max'] == 1.0


def test_round5_study_tools_helpers(tmp_path):
    """Round-5 tools: import rot guard + pure-helper checks (the
    heavyweight measure paths run on the TPU box / quiet host only)."""
    from tools import bs16_sched_probe as bsp
    # op histogram regex: parses representative optimized-HLO lines
    sample = (
        '  %fusion.1 = f32[8]{0} fusion(%p0), kind=kLoop, calls=%fused_computation.1\n'
        '  %copy-start.3 = (f32[2]{0}, f32[2]{0}, u32[]) copy-start(%x)\n'
        '  %copy-done.3 = f32[2]{0} copy-done(%copy-start.3)\n'
        '  ROOT %while.2 = (s32[]) while(%init), condition=%c, body=%b\n'
        '  %convert.9 = bf16[4]{0} convert(%y)\n')
    from collections import Counter
    counts = Counter(m.group(1) for m in bsp._OP_RE.finditer(sample))
    assert counts['fusion'] == 1 and counts['while'] == 1
    assert counts['copy-start'] == 1 and counts['copy-done'] == 1
    assert counts['convert'] == 1

    from tools import loader_feed_bench as lfb
    roidb, num_classes = lfb.build_pool(str(tmp_path / 'pool'), 6,
                                        num_classes=5)
    assert len(roidb) == 6 and num_classes == 6
    from dana_tpu.data.fs_loader import build_support_db
    assert sum(len(p) for p in build_support_db(roidb, num_classes)) > 0
    # pool build is deterministic across invocations (images reused)
    roidb2, _ = lfb.build_pool(str(tmp_path / 'pool'), 6, num_classes=5)
    np.testing.assert_array_equal(roidb[0]['boxes'], roidb2[0]['boxes'])
    rates = lfb.run_arm(roidb, num_classes, sup_cache=0, image_mb=0,
                        nw=0, bs=2, epochs=1, episodes_per_epoch=4)
    assert len(rates) == 1 and rates[0] > 0
    rates_w = lfb.run_arm(roidb, num_classes, sup_cache=256,
                          image_mb=64, nw=2, bs=2, epochs=1,
                          episodes_per_epoch=4)
    assert rates_w[0] > 0
    dec = lfb.decomposition(roidb, num_classes, 64)
    # smoke only — wall-clock RATIOS are too flaky for CI assertions
    assert dec['crop_source_hit_ms'] > 0 and dec['crop_miss_ms'] > 0
    from dana_tpu.data import blob
    blob.clear_image_cache()


def test_bench_measure_rate_median_and_spread():
    """bench._measure_rate: differenced-median math — median of the
    per-repeat rates, spread = (min, max), and the degenerate
    non-increasing timing clamps instead of dividing by <=0."""
    import importlib
    bench = importlib.import_module('bench')

    # timed(n) = 1s fixed dispatch + n * per-call, per-call varies by
    # repeat: rates should be work/per_call per repeat
    per_calls = iter([0.10, 0.10, 0.20, 0.20, 0.40,
                      0.10, 0.20, 0.40, 0.20, 0.10])

    class Timer:
        def __init__(self):
            self.cur = None
            self.calls = 0

        def __call__(self, n):
            if self.calls % 2 == 0:
                self.cur = next(per_calls)
            self.calls += 1
            return 1.0 + n * self.cur

    med, (lo, hi) = bench._measure_rate(Timer(), work=8, calls=(1, 9),
                                        repeats=5)
    # rates = 8/percall = [80, 40, 20] pattern -> sorted [20,20,40,40,80]
    assert med == pytest.approx(40.0)
    assert lo == pytest.approx(20.0) and hi == pytest.approx(80.0)

    # even repeat count -> mean of middle two
    med2, _ = bench._measure_rate(Timer(), work=8, calls=(1, 9),
                                  repeats=4)
    assert med2 == pytest.approx((40.0 + 40.0) / 2)

    # non-increasing wall (tunnel hiccup): clamped, never negative/inf
    med3, (lo3, hi3) = bench._measure_rate(lambda n: 1.0, work=8,
                                           repeats=3)
    assert np.isfinite(med3) and med3 > 0 and lo3 > 0 and hi3 > 0
