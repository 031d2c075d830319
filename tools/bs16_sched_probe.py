"""Close the bs16 backward-schedule question (VERDICT r4 item 4).

Round 4 measured per-episode backward cost bottoming at bs8 (5.55 ms)
and rising +6% at bs16 with temp buffers at only 5.9 GB of 16 GB HBM —
too small for the bs32 memory-pressure mechanism — and labeled the
cause "schedule quality", a hypothesis.  This probe makes it a
measurement by diffing the STRUCTURE of the optimized HLO that XLA
actually schedules at bs8 vs bs16 (production train step, frozen-grad
DCE, bf16+f32head, reference episode geometry):

  * If the two executables have the same per-program shape — identical
    fusion counts, while-loop counts, copy/convert counts — then XLA
    compiled the SAME program and the +6% is per-kernel efficiency at
    the larger tile extents (nothing a schedule knob can recover; close
    as not-worth-knowing, bs8 is the knee).
  * If bs16 shows materially more fusions / copies (fission to fit
    buffers) the memory-pressure mechanism extends down to bs16 and the
    hypothesis is CONFIRMED with the artifact in hand.

Usage (TPU): python tools/bs16_sched_probe.py [--batches 8 16]
CPU smoke:   PROF_DRY=1 python tools/bs16_sched_probe.py
Outcome recorded in PERF.md (round-5) and .scratch/bs16_sched_probe.json.
"""

import argparse
import json
import os
import os.path as osp
import re
import sys
from collections import Counter

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
if int(os.environ.get('PROF_DRY', '0')):
    jax.config.update('jax_platforms', 'cpu')
import utils as _cli_utils; _cli_utils.enable_compilation_cache()  # noqa: E702
import jax.numpy as jnp  # noqa: E402

try:
    from bs_regress_probe import make_batch, mem_info  # noqa: E402
except ImportError:       # imported as tools.bs16_sched_probe
    from tools.bs_regress_probe import make_batch, mem_info  # noqa: E402


_OP_RE = re.compile(r'^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[^=]*?\b'
                    r'(fusion|while|copy(?:-start|-done)?|convert|'
                    r'custom-call|all-reduce|dynamic-slice|'
                    r'dynamic-update-slice)\(', re.M)


def hlo_structure(compiled):
    """Operation histogram of the optimized module XLA schedules."""
    try:
        text = compiled.as_text()
    except Exception as e:  # pragma: no cover - backend-specific
        return {'hlo_error': str(e)[:120]}
    counts = Counter(m.group(1) for m in _OP_RE.finditer(text))
    counts['total_lines'] = text.count('\n')
    # fusion KINDS matter: loop fusions are the schedulable unit;
    # kInput/kOutput splits show up as distinct calls
    counts['fusion_kinds'] = len(set(
        re.findall(r'calls=%?([\w.\-]+)', text)))
    return dict(counts)


def probe(bs, dry=False):
    from dana_tpu.engine import optim, train as te
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp

    h, w, sup = (128, 160, 224) if dry else (608, 1024, 320)
    config = dana.DanaConfig(n_way=2, n_shot=3,
                             compute_dtype=jnp.bfloat16,
                             head_dtype=jnp.float32)
    params = to_jnp(dana.init_params(config, seed=0))
    trainable = optim.trainable_mask(params)
    state = te.create_train_state(params, 1e-3)
    step = te.make_train_step(config, trainable)
    batch = make_batch(bs, h, w, sup)
    rng = jax.random.PRNGKey(1)

    step_c = step.lower(state, batch, rng).compile()
    return {'bs': bs, 'mem': mem_info(step_c),
            'hlo': hlo_structure(step_c)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='*', default=[8, 16])
    args = ap.parse_args()
    dry = bool(int(os.environ.get('PROF_DRY', '0')))

    rows = [probe(bs, dry=dry) for bs in args.batches]
    for r in rows:
        print(json.dumps(r), flush=True)
    if len(rows) == 2 and 'fusion' in rows[0].get('hlo', {}):
        a, b = rows[0]['hlo'], rows[1]['hlo']
        keys = ('fusion', 'while', 'copy', 'copy-start', 'convert',
                'custom-call', 'dynamic-slice', 'dynamic-update-slice',
                'fusion_kinds')
        delta = {k: (a.get(k, 0), b.get(k, 0)) for k in keys
                 if a.get(k, 0) != b.get(k, 0)}
        same = not delta
        print(json.dumps({'structurally_identical': same,
                          'differing_op_counts': delta}))
    os.makedirs(osp.join(REPO, '.scratch'), exist_ok=True)
    with open(osp.join(REPO, '.scratch', 'bs16_sched_probe.json'),
              'w') as f:
        json.dump(rows, f, indent=1)


if __name__ == '__main__':
    main()
