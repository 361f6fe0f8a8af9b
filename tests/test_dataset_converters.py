"""Dataset-preparation tools on synthetic zips (reference
``tools/convert_datasets/{loveda,isaid}.py`` workflows)."""
import os
import os.path as osp
import sys
import zipfile

import cv2
import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools',
                            'convert_datasets'))


def _write_png(path, arr):
    os.makedirs(osp.dirname(path), exist_ok=True)
    assert cv2.imwrite(path, arr)


def _zip_dir(zip_path, root):
    with zipfile.ZipFile(zip_path, 'w') as zf:
        for dirpath, _, files in os.walk(root):
            for f in files:
                full = osp.join(dirpath, f)
                zf.write(full, osp.relpath(full, osp.dirname(root)))


def test_loveda_converter(tmp_path):
    import loveda
    rs = np.random.RandomState(0)
    src = tmp_path / 'src'
    for split in ('Train', 'Val', 'Test'):
        stage = tmp_path / f'stage_{split}' / split
        for loc in ('Rural', 'Urban'):
            img = rs.randint(0, 255, (16, 16, 3), np.uint8)
            _write_png(str(stage / loc / 'images_png' /
                           f'{split}_{loc}_1.png'), img)
            if split != 'Test':
                ann = rs.randint(0, 7, (16, 16)).astype(np.uint8)
                _write_png(str(stage / loc / 'masks_png' /
                               f'{split}_{loc}_1.png'), ann)
        os.makedirs(src, exist_ok=True)
        _zip_dir(str(src / f'{split}.zip'), str(stage))

    out = tmp_path / 'out'
    loveda.main([str(src), '-o', str(out)])
    assert len(os.listdir(out / 'img_dir' / 'train')) == 2
    assert len(os.listdir(out / 'ann_dir' / 'train')) == 2
    assert len(os.listdir(out / 'img_dir' / 'test')) == 2
    assert not (out / 'ann_dir' / 'test').exists()
    # prepared layout feeds LoveDADataset directly
    from pfst_tpu.datasets import build_dataset
    ds = build_dataset(dict(
        type='LoveDADataset', data_root=str(out),
        img_dir='img_dir/train', ann_dir='ann_dir/train',
        pipeline=[dict(type='LoadImageFromFile'),
                  dict(type='LoadAnnotations')]))
    assert len(ds) == 2


def test_isaid_converter(tmp_path):
    import isaid
    rs = np.random.RandomState(0)
    src = tmp_path / 'src'
    for split in ('train', 'val', 'test'):
        stage = tmp_path / f'stage_{split}' / 'images'
        img = rs.randint(0, 255, (20, 28, 3), np.uint8)
        _write_png(str(stage / f'P000{1 if split == "train" else 2}.png'),
                   img)
        os.makedirs(src / split / 'images', exist_ok=True)
        _zip_dir(str(src / split / 'images' / 'part1.zip'), str(stage))
        if split == 'test':
            continue
        lab_stage = tmp_path / f'lab_{split}' / 'images'
        # color-coded mask using palette entries 0,1,2
        lab = np.zeros((20, 28, 3), np.uint8)
        lab[:10, :, :] = np.asarray(isaid.PALETTE[1])[None, None]
        lab[10:, :14, :] = np.asarray(isaid.PALETTE[2])[None, None]
        _write_png(str(lab_stage /
                       f'P000{1 if split == "train" else 2}'
                       '_instance_color_RGB.png'), lab[..., ::-1])
        os.makedirs(src / split / 'Semantic_masks', exist_ok=True)
        _zip_dir(str(src / split / 'Semantic_masks' / 'part1.zip'),
                 str(lab_stage))

    out = tmp_path / 'out'
    isaid.main([str(src), '-o', str(out), '--patch_width', '16',
                '--patch_height', '16', '--overlap_area', '8'])
    train_imgs = sorted(os.listdir(out / 'img_dir' / 'train'))
    train_anns = sorted(os.listdir(out / 'ann_dir' / 'train'))
    # 20x28 image, 16-patches, stride 8 -> 2 y-windows x 3 x-windows
    assert len(train_imgs) == 6, train_imgs
    assert len(train_anns) == 6
    # windows clamp to the border: the last x window is (12, 28)
    assert any('_4_20_12_28' in n for n in train_imgs), train_imgs
    # color mask decoded to index labels
    ann = cv2.imread(str(out / 'ann_dir' / 'train' / train_anns[0]),
                     cv2.IMREAD_UNCHANGED)
    assert set(np.unique(ann)) <= {0, 1, 2, 255}
    assert 1 in np.unique(ann)
    # test split images move uncropped
    assert os.listdir(out / 'img_dir' / 'test') == ['P0002.png']


def test_isaid_color_to_index_roundtrip():
    import isaid
    rs = np.random.RandomState(1)
    idx = rs.randint(0, 16, (8, 8)).astype(np.uint8)
    rgb = np.asarray(isaid.PALETTE, np.uint8)[idx]
    back = isaid.color_to_index(rgb)
    np.testing.assert_array_equal(back, idx)
