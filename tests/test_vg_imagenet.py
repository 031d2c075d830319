"""Native Visual Genome / ImageNet parser tests on synthetic fixtures.

Covers the behaviors of the reference loaders
(/root/reference/lib/datasets/vg.py:29-283, imagenet.py:26-207): synonym
vocab mapping, out-of-vocab object skipping, box clamping, degenerate-box
whole-frame fallback, attribute caps, relation triple dedup, wnid->class
resolution, and the split-file routing.
"""

import os
import os.path as osp
import textwrap

import numpy as np
import pytest


def _write(path, content):
    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write(textwrap.dedent(content))


@pytest.fixture
def vg_root(tmp_path):
    d = str(tmp_path)
    genome = osp.join(d, 'genome')
    _write(osp.join(genome, '150-50-50', 'objects_vocab.txt'),
           'dog,puppy\ncat\n')
    _write(osp.join(genome, '150-50-50', 'attributes_vocab.txt'),
           'red\nfluffy,furry\n')
    _write(osp.join(genome, '150-50-50', 'relations_vocab.txt'),
           'on\nnear\n')
    _write(osp.join(genome, 'val.txt'),
           'VG_100K/7.jpg xml/7.xml\n'
           'VG_100K/8.jpg xml/8.xml\n'       # no in-vocab objects
           'VG_100K/9.jpg xml/9.xml\n')      # missing xml
    _write(osp.join(genome, 'xml', '7.xml'), '''\
        <annotation>
          <size><width>100</width><height>80</height></size>
          <object><name>PUPPY</name><object_id>a</object_id>
            <bndbox><xmin>-5</xmin><ymin>10</ymin><xmax>50</xmax><ymax>200</ymax></bndbox>
            <attribute>furry</attribute><attribute>red</attribute>
            <attribute>unknownattr</attribute>
          </object>
          <object><name>cat</name><object_id>b</object_id>
            <bndbox><xmin>60</xmin><ymin>40</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
          </object>
          <object><name>zebra</name><object_id>c</object_id>
            <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
          </object>
          <relation><predicate>ON</predicate>
            <subject_id>a</subject_id><object_id>b</object_id></relation>
          <relation><predicate>on</predicate>
            <subject_id>a</subject_id><object_id>b</object_id></relation>
          <relation><predicate>near</predicate>
            <subject_id>a</subject_id><object_id>c</object_id></relation>
        </annotation>''')
    _write(osp.join(genome, 'xml', '8.xml'), '''\
        <annotation>
          <size><width>10</width><height>10</height></size>
          <object><name>zebra</name>
            <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>5</xmax><ymax>5</ymax></bndbox>
          </object>
        </annotation>''')
    return d


def test_vg_parser(vg_root):
    from dana_tpu.data.vg import vg
    ds = vg('150-50-50', 'val',
            data_path=osp.join(vg_root, 'genome'),
            img_path=osp.join(vg_root, 'vg'))
    # image 8 (no in-vocab objects) and 9 (missing xml) are skipped
    assert ds._image_index == [7]
    assert ds.classes == ['__background__', 'dog', 'cat']
    # synonym maps to the same index
    assert ds._class_to_ind['puppy'] == ds._class_to_ind['dog'] == 1

    e = ds.gt_roidb()[0]
    assert e['gt_classes'].tolist() == [1, 2]       # zebra skipped
    # clamped to frame: x1 -5 -> 0, ymax 200 -> 79
    np.testing.assert_allclose(e['boxes'][0], [0, 10, 50, 79])
    # degenerate cat box (x2 < x1) -> whole frame
    np.testing.assert_allclose(e['boxes'][1], [0, 0, 99, 79])
    # attributes: furry->fluffy idx 2, red idx 1, unknown dropped
    assert e['gt_attributes'][0][:2].tolist() == [2, 1]
    assert e['gt_attributes'][0][2] == 0
    # relations deduped; triple touching out-of-vocab object dropped
    assert e['gt_relations'].tolist() == [[0, 1, 1]]

    # eval smoke: perfect detection of the dog box -> AP 1.0 for dog
    all_boxes = [[[] for _ in range(1)] for _ in range(3)]
    all_boxes[1][0] = np.array([[0, 10, 50, 79, 0.9]])
    res = ds.evaluate_detections(all_boxes)
    assert res['ap']['dog'] == 1.0


@pytest.fixture
def imagenet_root(tmp_path):
    d = str(tmp_path)
    devkit = osp.join(d, 'devkit')
    data = osp.join(d, 'data')
    _write(osp.join(devkit, 'data', 'meta_det.txt'),
           ''.join(f'n{i:08d}\tdetcls{i}\n' for i in range(200)))
    # VID synsets: first two shared with DET
    _write(osp.join(devkit, 'data', 'meta_vid.txt'),
           'n00000000\tairplane\nn00000001\tantelope\n'
           + ''.join(f'n9{i:07d}\tvidcls{i}\n' for i in range(2, 30)))
    _write(osp.join(data, 'ImageSets', 'val.txt'), 'img_001\n')
    _write(osp.join(data, 'Annotations', 'val', 'img_001.xml'), '''\
        <annotation>
          <size><width>640</width><height>480</height></size>
          <object><name>n00000001</name>
            <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>120</ymax></bndbox>
          </object>
          <object><name>n77777777</name>
            <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
          </object>
        </annotation>''')
    return devkit, data


def test_imagenet_parser(imagenet_root):
    from dana_tpu.data.imagenet import imagenet
    devkit, data = imagenet_root
    ds = imagenet('val', devkit, data)
    assert ds.num_classes == 31                      # 30 VID + background
    assert ds.classes[1] == 'airplane'
    # DET classes sharing a VID synset are flagged valid
    assert ds._valid_image_flag[1] == 1 and ds._valid_image_flag[2] == 1
    assert sum(ds._valid_image_flag) == 2

    e = ds.gt_roidb()[0]
    # antelope resolves via wnid; unknown wnid skipped
    assert e['gt_classes'].tolist() == [2]
    np.testing.assert_allclose(e['boxes'][0], [10, 20, 110, 120])
    assert e['width'] == 640 and e['height'] == 480
    assert ds.image_path_at(0).endswith('Data/val/img_001.JPEG')


def test_factory_names_resolve():
    """Registry keeps every reference vg/imagenet name resolvable."""
    from dana_tpu.data.factory import list_imdbs
    names = list_imdbs()
    for n in ['vg_150-50-50_train', 'vg_150-50-50_minival',
              'imagenet_train', 'imagenet_val']:
        assert n in names


def test_vg_map_counts_undetected_classes(vg_root):
    """A class with gt but zero detections contributes AP 0.0 to the
    mean (pascal_voc semantics) instead of being dropped."""
    from dana_tpu.data.vg import vg
    import os.path as osp
    ds = vg('150-50-50', 'val',
            data_path=osp.join(vg_root, 'genome'),
            img_path=osp.join(vg_root, 'vg'))
    all_boxes = [[[] for _ in range(1)] for _ in range(3)]
    all_boxes[1][0] = np.array([[0, 10, 50, 79, 0.9]])   # perfect dog
    res = ds.evaluate_detections(all_boxes)              # cat: no dets
    assert res['ap'] == {'dog': 1.0, 'cat': 0.0}
    assert res['map'] == 0.5


def test_factory_falls_back_on_incomplete_native_layout(tmp_path,
                                                        monkeypatch):
    """A bare DATA_DIR/genome dir (no vocab/split files) must not shadow
    the COCO-format ingest; same for a devkit without ImageSets."""
    import os
    from dana_tpu.utils.config import cfg
    from dana_tpu.data.factory import get_imdb
    monkeypatch.setattr(cfg, 'DATA_DIR', str(tmp_path))
    os.makedirs(tmp_path / 'genome')                       # incomplete
    os.makedirs(tmp_path / 'imagenet' / 'ILSVRC_devkit')   # incomplete
    for name in ['vg_150-50-50_val', 'imagenet_val', 'imagenet_test']:
        try:
            get_imdb(name)
        except FileNotFoundError as e:
            # the COCO-format fallback path is the one that errors
            assert 'annotations' in str(e) or '.json' in str(e), (name, e)
