"""Registry parity: every name the reference factory registers resolves.

The list below is built with the reference's own loops
(/root/reference/lib/datasets/factory.py:14-92) so a rename or missing
split fails loudly here rather than at a user's get_imdb call.
"""


def _reference_names():
    names = []
    for i in [256, 240, 224, 208, 200, 192, 160, 128, 100, 96, 80, 64,
              50, 48, 32, 30, 20, 16, 10]:
        names.append(f'ycb2d_replace{i}')
    names += ['ycb2d_inference_sparse', 'ycb2d_inferencefs_sparse',
              'ycb2d_inference_dense', 'ycb2d_inferencefs_dense',
              'ycb2d_inference']
    for i in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16,
              '1cls', '2cls', '3cls', '4cls']:
        names.append(f'ycb2d_stage{i}')
    for i in [512, 256, 128, 64, 32, 16, 8]:
        names.append(f'ycb2d_oracle{i}')
    for i in [64, 32, 16]:
        names.append(f'ycb2d_oracle_dense{i}')
    for i in [20, 10, 5]:
        names.append(f'ycb2d_fsoracle_dense{i}')
    for i in range(1, 10):
        names.append(f'ycb2d_pseudo{i}')
    names.append('coco_ft')
    for year in ['set1', 'set2']:
        for split in ['3way', '5way']:
            names.append(f'coco_{split}_{year}')
    for year in ['set1', 'set2', 'set3', 'set4']:
        names.append(f'coco_vis_{year}')
        names.append(f'coco_20_{year}')
    for year in ['set1', 'set2', 'set3', 'set4', 'set1allcat']:
        names.append(f'coco_60_{year}')
    for year in ['novel', 'base', 'val']:
        for n in range(600):
            names.append(f'coco_{year}_ep{n}')
    for year in ['2007', '2012']:
        for split in ['train', 'val', 'trainval', 'test']:
            names.append(f'voc_{year}_{split}')
    for split in ['train', 'val', 'minival', 'valminusminival',
                  'trainval']:
        names.append(f'coco_2014_{split}')
    return names


def test_every_reference_factory_name_registered():
    from dana_tpu.data.factory import list_imdbs
    ours = set(list_imdbs())
    missing = [n for n in _reference_names() if n not in ours]
    assert not missing, f'{len(missing)} missing: {missing[:10]}'
