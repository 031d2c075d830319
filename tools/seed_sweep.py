"""Seed-averaged flagship synth result (VERDICT r3 item 5).

The single-seed 5-way 2-shot claim (AP 0.761 / AP50 0.928) showed large
run-to-run variance on 240 images; this sweep trains N independent
seeds of the flagship protocol (synth_train_big, 288k steps = 600
epochs x 480 episodes, tools/synth_train_eval.py) with EVERYTHING
stochastic varied per seed (init, support draws, step PRNG), evaluates
each with the 5-way 2-shot MultiwayLoader protocol
(tools/synth_multiway_eval.py), and reports mean +- range.  Eval
supports stay pinned at seed 0 so the spread measures training
variance, not eval-support luck.

Each ~40 min seed is checkpointed to ROWS_PATH as soon as its eval
finishes, and already-recorded (seed, epochs) rows are skipped on
restart — a killed sweep resumes at the first unfinished seed instead
of retraining everything.

Usage: python tools/seed_sweep.py [n_seeds] [epochs]
"""

import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

ROWS_PATH = '/root/repo/.scratch/seed_sweep_rows.jsonl'
OUT_PATH = '/root/repo/.scratch/seed_sweep.json'


def load_rows(epochs, path=ROWS_PATH):
    """Completed rows of a previous (possibly killed) sweep at the same
    epoch count, keyed by seed; later duplicates win."""
    rows = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if row.get('epochs') == epochs:
                    rows[row['seed']] = row
    return rows


def summarize(rows):
    def stat(key):
        v = np.array([r[key] for r in rows])
        return (float(v.mean()), float(v.min()), float(v.max()))

    return {k: dict(zip(('mean', 'min', 'max'), stat(k)))
            for k in ('ap', 'ap50', 'single_ap', 'single_ap50')}


def main(n_seeds=3, epochs=600):
    from tools import synth_train_eval, synth_multiway_eval

    done = load_rows(epochs)
    for seed in range(n_seeds):
        if seed in done:
            print(f'[seed {seed}] cached: 5-way AP {done[seed]["ap"]:.3f} '
                  f'AP50 {done[seed]["ap50"]:.3f}', flush=True)
            continue
        ckpt = f'/root/repo/.scratch/synth_seed{seed}.dkpt'
        os.environ['SYNTH_OUT_CKPT'] = ckpt
        t0 = time.time()
        single = synth_train_eval.main(epochs, 'synth_train_big',
                                       'synth_test', seed=seed)
        multi = synth_multiway_eval.main(ckpt, 5, 2)
        row = {
            'seed': seed,
            'epochs': epochs,
            'single_ap': float(single['stats'][0]),
            'single_ap50': float(single['stats'][1]),
            'ap': float(multi['stats'][0]),
            'ap50': float(multi['stats'][1]),
            'minutes': round((time.time() - t0) / 60, 1),
        }
        with open(ROWS_PATH, 'a') as f:
            f.write(json.dumps(row) + '\n')
        done[seed] = row
        print(f'[seed {seed}] 5-way AP {row["ap"]:.3f} '
              f'AP50 {row["ap50"]:.3f} '
              f'({row["minutes"]} min)', flush=True)

    rows = [done[s] for s in range(n_seeds)]
    summary = summarize(rows)
    out = {'protocol': f'{n_seeds} seeds x {epochs} epochs '
                       f'synth_train_big, 5-way 2-shot multiway eval',
           'rows': rows, 'summary': summary}
    with open(OUT_PATH, 'w') as f:
        json.dump(out, f, indent=1)
    m, lo, hi = summary['ap']['mean'], summary['ap']['min'], \
        summary['ap']['max']
    m5, lo5, hi5 = summary['ap50']['mean'], summary['ap50']['min'], \
        summary['ap50']['max']
    print(f'\nSEED SWEEP ({n_seeds} seeds): '
          f'5-way AP {m:.3f} [{lo:.3f}, {hi:.3f}]  '
          f'AP50 {m5:.3f} [{lo5:.3f}, {hi5:.3f}]  -> {OUT_PATH}')
    return out


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3,
         int(sys.argv[2]) if len(sys.argv) > 2 else 600)
