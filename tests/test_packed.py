"""Packed image store (`pipelines/packing.py` + `tools/pack_dataset.py`):
mmap-served reads must be byte-identical to cv2 decode in every imread
mode, invisible to the pipeline, and fall back to disk for unpacked
files."""
import os
import os.path as osp
import sys

import cv2
import numpy as np
import pytest

from pfst_tpu.datasets.pipelines import packing
from pfst_tpu.datasets.pipelines.loading import imread

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))


@pytest.fixture
def corpus(tmp_path):
    d = tmp_path / 'imgs'
    os.makedirs(d)
    rs = np.random.RandomState(0)
    cv2.imwrite(str(d / 'color.png'),
                rs.randint(0, 255, (20, 24, 3), np.uint8))
    cv2.imwrite(str(d / 'gray.png'),
                rs.randint(0, 7, (20, 24), np.uint8))
    cv2.imwrite(str(d / 'wide.jpg'),
                rs.randint(0, 255, (8, 40, 3), np.uint8))  # mixed shape
    yield str(d)
    packing.invalidate()


def test_pack_roundtrip_all_modes(corpus):
    refs = {}
    for name in ('color.png', 'gray.png', 'wide.jpg'):
        p = osp.join(corpus, name)
        refs[name] = {
            'color': cv2.imread(p, cv2.IMREAD_COLOR),
            'gray': cv2.imread(p, cv2.IMREAD_GRAYSCALE),
            'unchanged': cv2.imread(p, cv2.IMREAD_UNCHANGED),
        }
    n = packing.pack_directory(corpus)
    assert n == 3
    for name, modes in refs.items():
        p = osp.join(corpus, name)
        np.testing.assert_array_equal(imread(p), modes['color'])
        np.testing.assert_array_equal(imread(p, color=False),
                                      modes['gray'])
        np.testing.assert_array_equal(imread(p, unchanged=True),
                                      modes['unchanged'])
    # served from the pack, not the decoder: delete the files
    for name in refs:
        os.remove(osp.join(corpus, name))
    packing.invalidate()
    np.testing.assert_array_equal(
        imread(osp.join(corpus, 'color.png')),
        refs['color.png']['color'])


def test_packed_read_is_writable_copy(corpus):
    packing.pack_directory(corpus)
    p = osp.join(corpus, 'gray.png')
    a = imread(p, unchanged=True)
    a[0, 0] = 99  # pipelines mutate labels in place
    b = imread(p, unchanged=True)
    assert b[0, 0] != 99


def test_unpacked_file_falls_back_to_disk(corpus):
    packing.pack_directory(corpus)
    rs = np.random.RandomState(1)
    extra = rs.randint(0, 255, (6, 6, 3), np.uint8)
    cv2.imwrite(osp.join(corpus, 'later.png'), extra)
    np.testing.assert_array_equal(
        imread(osp.join(corpus, 'later.png')),
        cv2.imread(osp.join(corpus, 'later.png')))


def test_pipeline_output_identical_with_pack(tmp_path):
    """A deterministic test pipeline produces byte-identical samples
    whether the corpus is packed or not — packing is invisible."""
    from pfst_tpu.datasets import build_dataset
    root = tmp_path / 'ds'
    rs = np.random.RandomState(2)
    os.makedirs(root / 'img_dir' / 'val')
    os.makedirs(root / 'ann_dir' / 'val')
    for i in range(2):
        cv2.imwrite(str(root / 'img_dir' / 'val' / f'x{i}.png'),
                    rs.randint(0, 255, (40, 40, 3), np.uint8))
        cv2.imwrite(str(root / 'ann_dir' / 'val' / f'x{i}.png'),
                    rs.randint(0, 7, (40, 40)).astype(np.uint8))
    ds_cfg = dict(
        type='ISPRSDataset', data_root=str(root),
        img_dir='img_dir/val', ann_dir='ann_dir/val', test_mode=True,
        gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='MultiScaleFlipAug', img_scale=(40, 40),
                 flip=False, transforms=[
                     dict(type='Resize', keep_ratio=True),
                     dict(type='Normalize', mean=[127.5] * 3,
                          std=[127.5] * 3, to_rgb=True),
                     dict(type='ImageToTensor', keys=['img']),
                     dict(type='Collect', keys=['img'])])])
    ds = build_dataset(dict(ds_cfg))
    plain = [np.asarray(ds[i]['img'][0]) for i in range(2)]

    import pack_dataset
    n = pack_dataset.main([str(root), '--recursive'])
    assert n == 4  # 2 images + 2 annotations
    ds2 = build_dataset(dict(ds_cfg))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(ds2[i]['img'][0]),
                                      plain[i])
    packing.invalidate()


def test_repack_is_safe_for_live_readers(corpus):
    """Re-packing writes a fresh uniquely-named blob referenced by the
    atomically-replaced index: a reader holding the OLD pack keeps
    producing correct bytes (unlinked blob stays readable), and new
    readers see the new content."""
    packing.pack_directory(corpus)
    p = osp.join(corpus, 'color.png')
    before = imread(p)
    # hold the old pack open
    old_pack = packing._packs[osp.abspath(corpus)]
    # change the file and re-pack
    new_img = np.random.RandomState(5).randint(
        0, 255, (20, 24, 3), np.uint8)
    cv2.imwrite(p, new_img)
    packing.pack_directory(corpus)
    after = imread(p)
    np.testing.assert_array_equal(after, cv2.imread(p))
    assert not np.array_equal(before, after)
    # the old handle still serves the old bytes
    np.testing.assert_array_equal(
        old_pack.get('color.png', color=True, unchanged=False), before)
    # exactly one blob file remains
    blobs = [f for f in os.listdir(corpus)
             if f.startswith(packing.PACK_BIN)]
    assert len(blobs) == 1, blobs
