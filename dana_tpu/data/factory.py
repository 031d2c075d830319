"""Dataset registry: name -> constructor.

Parity: /root/reference/lib/datasets/factory.py:14-102 — every reference
registry name resolves here (coco FSOD splits, episodes, finetune, plain
coco, ycb2d, pascal_voc), plus environment-local `synth_*` sets.
Datasets are constructed lazily; missing annotation files raise at
construction with the expected path in the error.
"""

from __future__ import annotations

import os.path as osp

from dana_tpu.data.coco_split import CocoFormatDataset, coco_split, \
    _coco_image_name

__sets = {}


def _register(name, fn):
    __sets[name] = fn


def _coco_dir():
    from dana_tpu.utils.config import cfg
    return osp.join(cfg.DATA_DIR, 'coco')


def _register_all():
    # FSOD splits — the reference's exact registrations
    # (factory.py:46-70): coco_{60,20,vis}_{set1..4} (+set1allcat for
    # 60), coco_{3way,5way}_{set1,set2}, coco_ft
    for year in ['set1', 'set2', 'set3', 'set4', 'set1allcat']:
        _register(f'coco_60_{year}', lambda y=year: coco_split('60', y))
    for year in ['set1', 'set2', 'set3', 'set4']:
        _register(f'coco_20_{year}', lambda y=year: coco_split('20', y))
        _register(f'coco_vis_{year}', lambda y=year: coco_split('vis', y))
    for split in ['3way', '5way']:
        for year in ['set1', 'set2']:
            _register(f'coco_{split}_{year}',
                      lambda s=split, y=year: coco_split(s, y))
    _register('coco_ft', lambda: coco_split('shot', '10'))
    # environment-local aliases kept from round 1
    for tag in ['3way1', '3way2']:
        _register(f'coco_20_{tag}', lambda t=tag: coco_split('3way', t))
    for tag in ['5way1', '5way2']:
        _register(f'coco_20_{tag}', lambda t=tag: coco_split('5way', t))
    _register('coco_ft_shot30', lambda: coco_split('shot', 'shot30'))

    # pre-generated episodes (factory.py:73-77, episode.py:70-76)
    def episode_ds(kind, n):
        d = _coco_dir()
        sub = {'novel': ('coco_epi', f'novel_ep{n}.json', 'val2014'),
               'base': ('coco_epi', f'base_ep{n}.json', 'val2014'),
               'val': ('coco_val', f'val_ep{n}.json', 'val2014')}[kind]
        ann = osp.join(d, 'annotations', sub[0], sub[1])
        return CocoFormatDataset(f'coco_{kind}_ep{n}', ann,
                                 osp.join(d, 'images', sub[2]),
                                 _coco_image_name(sub[2]))
    for n in range(600):
        _register(f'coco_novel_ep{n}', lambda k='novel', i=n: episode_ds(k, i))
        _register(f'coco_base_ep{n}', lambda k='base', i=n: episode_ds(k, i))
        _register(f'coco_val_ep{n}', lambda k='val', i=n: episode_ds(k, i))

    # standard COCO 2014 (coco.py; factory.py:47-55)
    def coco2014(split):
        d = _coco_dir()
        ann = osp.join(d, 'annotations', f'instances_{split}2014.json')
        return CocoFormatDataset(f'coco_2014_{split}', ann,
                                 osp.join(d, 'images', f'{split}2014'),
                                 _coco_image_name(f'{split}2014'))
    for split in ['train', 'val', 'minival', 'valminusminival',
                  'trainval']:
        _register(f'coco_2014_{split}', lambda s=split: coco2014(s))

    # coco80 finetune (coco_finetune.py:63-66)
    def coco_ft():
        d = _coco_dir()
        ann = osp.join(d, 'annotations', 'coco80_finetune',
                       'instances_shot.json')
        return CocoFormatDataset('coco_80_ft', ann,
                                 osp.join(d, 'images', 'train2014'),
                                 _coco_image_name('train2014'))
    _register('coco_80_ft', coco_ft)

    # ycb2d robotics sets (ycb2d.py; factory.py:14-44): COCO-format anns
    def ycb2d(split):
        from dana_tpu.utils.config import cfg
        d = osp.join(cfg.DATA_DIR, 'ycb2d')
        ann = osp.join(d, 'annotations', f'{split}.json')
        return CocoFormatDataset(f'ycb2d_{split}', ann,
                                 osp.join(d, 'images'))
    # the reference's exact ycb2d names (factory.py:14-44): each maps a
    # (split, year) pair; annotations are COCO-format per tag
    ycb_tags = []
    for i in [256, 240, 224, 208, 200, 192, 160, 128, 100, 96, 80, 64,
              50, 48, 32, 30, 20, 16, 10]:
        ycb_tags.append(f'replace{i}')
    ycb_tags += ['inference_sparse', 'inferencefs_sparse',
                 'inference_dense', 'inferencefs_dense', 'inference']
    for i in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16,
              '1cls', '2cls', '3cls', '4cls']:
        ycb_tags.append(f'stage{i}')
    for i in [512, 256, 128, 64, 32, 16, 8]:
        ycb_tags.append(f'oracle{i}')
    for i in [64, 32, 16]:
        ycb_tags.append(f'oracle_dense{i}')
    for i in [20, 10, 5]:
        ycb_tags.append(f'fsoracle_dense{i}')
    for i in range(1, 10):
        ycb_tags.append(f'pseudo{i}')
    # environment-local extras kept from round 1
    ycb_tags += ['train', 'val', 'test', 'debug', 'strict', 'normal',
                 'hard', 'ycbv_train', 'ycbv_debug']
    for split in ycb_tags:
        _register(f'ycb2d_{split}', lambda s=split: ycb2d(s))

    # visual genome / imagenet (vg.py, imagenet.py — unused by any FSOD
    # flow, SURVEY §2.5).  Native parsers (dana_tpu/data/{vg,imagenet}.py:
    # scene-graph XML / devkit synsets) are used when the reference's
    # directory layout exists; otherwise ingestion falls back to
    # COCO-format annotations at DATA_DIR/{vg,imagenet}/annotations/
    # <split>.json (a converted file).
    def generic(root, split):
        from dana_tpu.utils.config import cfg
        d = osp.join(cfg.DATA_DIR, root)
        return CocoFormatDataset(
            f'{root}_{split}', osp.join(d, 'annotations', f'{split}.json'),
            osp.join(d, 'images'))

    def vg_ds(version, split):
        from dana_tpu.utils.config import cfg
        from dana_tpu.data.vg import _SPLIT_FILES
        genome = osp.join(cfg.DATA_DIR, 'genome')
        base = _SPLIT_FILES.get(split, (split, None))[0]
        # route to the native parser only when its full layout exists
        # (vocab + split txt); a bare genome/ dir of raw images must not
        # shadow the COCO-format fallback
        if osp.exists(osp.join(genome, version, 'objects_vocab.txt')) \
                and osp.exists(osp.join(genome, base + '.txt')):
            from dana_tpu.data.vg import vg
            return vg(version, split)
        return generic('vg', split)

    def imagenet_ds(split):
        from dana_tpu.utils.config import cfg
        devkit = osp.join(cfg.DATA_DIR, 'imagenet', 'ILSVRC_devkit')
        data = osp.join(cfg.DATA_DIR, 'imagenet', 'ILSVRC')
        sets_file = osp.join(
            data, 'ImageSets',
            ('trainr' if split == 'train' else 'val') + '.txt')
        # the devkit parser covers the reference's train/val layouts
        # (imagenet.py:95-148); other registered splits and incomplete
        # layouts use the COCO-format ingest
        if split in ('train', 'val') and osp.isdir(devkit) \
                and osp.exists(sets_file):
            from dana_tpu.data.imagenet import imagenet
            return imagenet(split, devkit, data)
        return generic('imagenet', split)

    for split in ['train', 'val', 'minival', 'minitrain', 'smalltrain',
                  'smallval']:
        _register(f'vg_150-50-50_{split}',
                  lambda s=split: vg_ds('150-50-50', s))
    for split in ['train', 'val', 'trainval1', 'trainval2', 'test']:
        _register(f'imagenet_{split}', lambda s=split: imagenet_ds(s))

    # pascal voc (pascal_voc.py)
    def voc(year, split):
        from dana_tpu.data.pascal_voc import pascal_voc
        return pascal_voc(split, year)
    for year in ['2007', '2012']:
        for split in ['train', 'val', 'trainval', 'test']:
            _register(f'voc_{year}_{split}',
                      lambda y=year, s=split: voc(y, s))

    # synthetic environment-local sets
    from dana_tpu.data.synth import synth_fsod
    _register('synth_train', lambda: synth_fsod('train'))
    _register('synth_test', lambda: synth_fsod('test', num_images=20))
    _register('synth_train_big', lambda: synth_fsod('train_big',
                                                    num_images=240))
    _register('synth_test_big', lambda: synth_fsod('test_big',
                                                   num_images=60))
    # end-to-end CLI throughput runs (host decode + pack + device):
    # large enough that steady-state dominates compile/warmup
    _register('synth_test_400', lambda: synth_fsod('test_400',
                                                   num_images=400))
    # support-source alias for the 400-image eval (inference.py derives
    # the support split by test->train name substitution)
    _register('synth_train_400', lambda: synth_fsod('train_big',
                                                    num_images=240))


_register_all()


def get_imdb(name: str):
    """Construct the dataset registered under `name`
    (factory.py get_imdb:93-97)."""
    if name not in __sets:
        raise KeyError(f'Unknown dataset: {name}')
    return __sets[name]()


def list_imdbs():
    return list(__sets.keys())
