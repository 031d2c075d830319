"""Export a checkpoint as a serving artifact (dana_tpu/serve.py).

Serializes the AOT predict step per query bucket + the support encoder
to StableHLO, optionally int8-quantizing the backbone first
(dana_tpu/quant.py).  The artifact serves without the model code.

    python tools/export_serving.py --checkpath ckpt.dkpt \
        --out artifacts/dana_r50 [--bs 8] [--way 2] [--shot 3] \
        [--arch resnet50] [--quant tail|all] [--platforms tpu]

Smoke-tested by tests/test_tools_smoke.py (CPU, tiny shapes).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--checkpath', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--bs', type=int, default=8)
    ap.add_argument('--way', type=int, default=2)
    ap.add_argument('--shot', type=int, default=3)
    ap.add_argument('--arch', default='resnet50')
    ap.add_argument('--quant', default=None, choices=('tail', 'all'))
    ap.add_argument('--s2d', action='store_true',
                    help='export for host-packed space-to-depth inputs')
    ap.add_argument('--platforms', nargs='*', default=None,
                    help="cross-export targets, e.g. --platforms tpu")
    ap.add_argument('--buckets', default=None,
                    help='comma list like 608x1024,704x704 '
                         '(default: cfg.TPU.SIZE_BUCKETS)')
    ap.add_argument('--cfg', dest='cfg_file', default=None,
                    help='experiment YAML (same as the CLIs)')
    ap.add_argument('--set', dest='set_cfgs', nargs='*', default=None,
                    help='cfg key-value override pairs')
    ap.add_argument('--ascale', type=int, default=4, choices=(3, 4),
                    help='anchor-scale preset, same as the CLIs '
                         '(reference utils.py:68-73); must match the '
                         'checkpoint (validated against the RPN head)')
    args = ap.parse_args(argv)

    import utils as cli_utils
    from dana_tpu import serve
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp
    from dana_tpu.utils import checkpoint as ckpt_lib
    from dana_tpu.utils.config import cfg, cfg_from_file, cfg_from_list

    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    cfg_from_list(['ANCHOR_SCALES',
                   '[8, 16, 32]' if args.ascale == 3 else '[4, 8, 16, 32]',
                   'ANCHOR_RATIOS', '[0.5,1,2]'])
    if args.set_cfgs:          # explicit --set pairs win over the preset
        cfg_from_list(args.set_cfgs)

    payload = ckpt_lib.load_checkpoint(args.checkpath)
    params = payload['model']
    # the checkpoint carries POOLING_MODE (reference train.py:100)
    cfg.POOLING_MODE = payload.get('pooling_mode', cfg.POOLING_MODE)
    if args.quant:
        from dana_tpu import quant
        params = quant.quantize_params(params, scope=args.quant)
    params = to_jnp(params)

    # full cfg->config mapping shared with utils.get_model so the
    # artifact is traced with the SAME anchors/NMS tops/pooling the
    # training run and the eval CLI use — not dataclass defaults
    kw = cli_utils.model_config_kwargs(args.way, args.shot, args.arch)
    # int8 serving also routes RoIAlign through the int8 MXU path
    # (ops/roi_align.py); --quant overrides whatever cfg said
    kw['roi_align_int8'] = bool(args.quant)
    config = dana.DanaConfig(**kw)

    # fail loudly if the anchor config disagrees with the checkpoint:
    # the RPN cls head has 2A output channels, so a mismatched --ascale
    # would otherwise export an artifact that decodes garbage proposals
    head_ch = payload['model']['RCNN_rpn']['RPN_cls_score']['weight']
    head_ch = head_ch.shape[-1]
    if head_ch != 2 * config.num_anchors:
        raise SystemExit(
            f'anchor mismatch: checkpoint RPN head has {head_ch // 2} '
            f'anchors/position but ANCHOR_SCALES x ANCHOR_RATIOS gives '
            f'{config.num_anchors} — pass the --ascale/--set the '
            f'checkpoint was trained with')
    if args.buckets:
        buckets = tuple(tuple(int(v) for v in b.split('x'))
                        for b in args.buckets.split(','))
    else:
        buckets = tuple(tuple(b) for b in cfg.TPU.SIZE_BUCKETS)

    meta = serve.export_predictor(
        params, config, args.out, buckets=buckets, batch_size=args.bs,
        s2d=args.s2d, platforms=args.platforms,
        pp_kwargs={'nms_thresh': cfg.TEST.NMS})
    total = sum(os.path.getsize(os.path.join(args.out, f))
                for f in os.listdir(args.out))
    print(f"exported {len(meta['buckets'])} bucket artifacts + encoder "
          f"to {args.out} ({total / 1e6:.1f} MB)"
          f"{' [int8 ' + args.quant + ']' if args.quant else ''}")


if __name__ == '__main__':
    main()
