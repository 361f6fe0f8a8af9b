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


def test_cityscapes_converter(tmp_path):
    import json

    import cityscapes

    gt = tmp_path / 'gtFine'
    for split, city, stem in (('train', 'aachen', 'aachen_000000_000019'),
                              ('val', 'frankfurt',
                               'frankfurt_000000_000294')):
        ann = {
            'imgHeight': 32, 'imgWidth': 48,
            'objects': [
                # background object first, overdrawn by later ones
                {'label': 'road',
                 'polygon': [[0, 0], [47, 0], [47, 31], [0, 31]]},
                {'label': 'cargroup',  # group name -> car trainId 13
                 'polygon': [[4, 4], [20, 4], [20, 12], [4, 12]]},
                {'label': 'sky',
                 'polygon': [[30, 20], [40, 20], [40, 28], [30, 28]]},
                {'label': 'dynamic',  # not in the 19-class set -> 255
                 'polygon': [[0, 28], [6, 28], [6, 31], [0, 31]]},
                {'label': 'person', 'deleted': 1,  # skipped
                 'polygon': [[25, 2], [28, 2], [28, 6], [25, 6]]},
            ],
        }
        d = gt / split / city
        os.makedirs(d, exist_ok=True)
        with open(d / f'{stem}_gtFine_polygons.json', 'w') as f:
            json.dump(ann, f)

    cityscapes.main([str(tmp_path)])

    lab = cv2.imread(
        str(gt / 'train' / 'aachen' /
            'aachen_000000_000019_gtFine_labelTrainIds.png'),
        cv2.IMREAD_UNCHANGED)
    assert lab.shape == (32, 48)
    assert lab[0, 0] == 0          # road
    assert lab[8, 10] == 13        # cargroup -> car
    assert lab[24, 35] == 10       # sky
    assert lab[30, 3] == 255       # dynamic -> ignore
    assert lab[4, 26] == 0         # deleted person not drawn over road
    with open(tmp_path / 'train.txt') as f:
        assert f.read().split() == ['aachen_000000_000019']
    with open(tmp_path / 'test.txt') as f:
        assert f.read().split() == []


def test_coco_stuff164k_converter(tmp_path):
    import coco_stuff

    rs = np.random.RandomState(0)
    for split in ('train2017', 'val2017'):
        img = rs.randint(0, 255, (8, 8, 3), np.uint8)
        _write_png(str(tmp_path / 'images' / split / 'a.jpg'), img)
        mask = np.array([[0, 11, 12, 25], [26, 181, 255, 91]] * 4,
                        np.uint8).reshape(8, 4)
        _write_png(str(tmp_path / 'annotations' / split / 'a.png'), mask)

    coco_stuff.main(['164k', str(tmp_path)])
    out = cv2.imread(
        str(tmp_path / 'annotations' / 'train2017' /
            'a_labelTrainIds.png'), cv2.IMREAD_UNCHANGED)
    # renumbering skips the 11 unannotated ids: 12->11, 26->24,
    # 181->170, 91->80; untouched ids keep mmseg's pass-through
    np.testing.assert_array_equal(
        out[:2], np.array([[0, 11, 11, 25], [24, 170, 255, 80]],
                          np.uint8))


def test_coco_stuff10k_converter(tmp_path):
    import coco_stuff
    from scipy.io import savemat

    rs = np.random.RandomState(0)
    os.makedirs(tmp_path / 'imageLists', exist_ok=True)
    for name, lst in (('x1', 'train'), ('x2', 'test')):
        img = rs.randint(0, 255, (8, 8, 3), np.uint8)
        _write_png(str(tmp_path / 'images' / f'{name}.jpg'), img)
        mask = np.array([[1, 12, 13, 27], [182, 2, 3, 92]] * 4,
                        np.uint8).reshape(8, 4)
        os.makedirs(tmp_path / 'annotations', exist_ok=True)
        savemat(str(tmp_path / 'annotations' / f'{name}.mat'),
                {'S': mask})
        with open(tmp_path / 'imageLists' / f'{lst}.txt', 'w') as f:
            f.write(name + '\n')

    out_dir = tmp_path / 'out'
    coco_stuff.main(['10k', str(tmp_path), '-o', str(out_dir)])
    out = cv2.imread(
        str(out_dir / 'annotations' / 'train2014' /
            'x1_labelTrainIds.png'), cv2.IMREAD_UNCHANGED)
    # 10k labels are 164k ids + 1: 1->1, 13->12, 27->25, 182->171
    np.testing.assert_array_equal(
        out[:2], np.array([[1, 12, 12, 25], [171, 2, 3, 81]], np.uint8))
    assert (out_dir / 'images' / 'test2014' / 'x2.jpg').exists()


def test_isprs_color_semantics():
    """ISPRS label colors map to the right class ids: building is RGB
    blue, clutter RGB red (the table is BGR because cv2 reads BGR —
    regression for a swapped building<->clutter / low-veg<->car map)."""
    import isprs

    # compose a label tile in RGB, convert to the BGR layout cv2 gives
    rgb = {
        'impervious': [255, 255, 255], 'building': [0, 0, 255],
        'low_veg': [0, 255, 255], 'tree': [0, 255, 0],
        'car': [255, 255, 0], 'clutter': [255, 0, 0],
    }
    names = list(rgb)
    tile_rgb = np.concatenate(
        [np.tile(np.asarray(v, np.uint8), (2, 3, 1))
         for v in rgb.values()], axis=0)  # (12, 3, 3)
    tile_bgr = tile_rgb[..., ::-1]
    idx = isprs.rgb_label_to_index(tile_bgr)
    # raw ids: 0=boundary, then CLASSES order starting at 1
    for i, name in enumerate(names):
        got = np.unique(idx[i * 2:(i + 1) * 2])
        assert list(got) == [i + 1], (name, got)


# ---- round-3: retina (chase_db1/drive/hrf/stare) + voc_aug ----------

def _flat_zip(zip_path, files):
    """zip of loose files: {name: ndarray-written-via-cv2-encoding}"""
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        with zipfile.ZipFile(zip_path, 'w') as zf:
            for name, arr in files.items():
                p = osp.join(tmp, name)
                _write_png(p, arr)
                zf.write(p, name)


def test_chase_db1_converter(tmp_path):
    import retina
    rs = np.random.RandomState(0)
    files = {}
    for i in range(28):
        stem = f'Image_{i:02d}'
        files[f'{stem}.jpg'] = rs.randint(0, 255, (16, 16, 3), np.uint8)
        for tag in ('1stHO', '2ndHO'):
            files[f'{stem}_{tag}.png'] = (
                rs.randint(0, 2, (16, 16), np.uint8) * 255)
    _flat_zip(str(tmp_path / 'CHASEDB1.zip'), files)
    out = tmp_path / 'out'
    retina.main(['chase_db1', str(tmp_path / 'CHASEDB1.zip'),
                 '-o', str(out)])
    n_tr_img = len(os.listdir(out / 'images' / 'training'))
    n_tr_ann = len(os.listdir(out / 'annotations' / 'training'))
    assert n_tr_img + n_tr_ann == 60  # reference TRAINING_LEN split
    # binarised annotations
    ann = cv2.imread(
        str(out / 'annotations' / 'training' /
            os.listdir(out / 'annotations' / 'training')[0]),
        cv2.IMREAD_UNCHANGED)
    assert set(np.unique(ann)) <= {0, 1}


def test_drive_converter(tmp_path):
    import retina
    rs = np.random.RandomState(0)
    for src_split, n in (('training', 3), ('test', 2)):
        stage = tmp_path / f'stage_{src_split}' / src_split
        for i in range(n):
            _write_png(str(stage / 'images' /
                           f'{20 + i}_{src_split}.png'),
                       rs.randint(0, 255, (16, 16, 3), np.uint8))
            _write_png(str(stage / '1st_manual' /
                           f'{20 + i}_manual1.png'),
                       rs.randint(0, 2, (16, 16), np.uint8) * 255)
        _zip_dir(str(tmp_path / f'{src_split}.zip'), str(stage))
    out = tmp_path / 'out'
    retina.main(['drive', str(tmp_path / 'training.zip'),
                 str(tmp_path / 'test.zip'), '-o', str(out)])
    assert len(os.listdir(out / 'images' / 'training')) == 3
    assert len(os.listdir(out / 'images' / 'validation')) == 2
    assert len(os.listdir(out / 'annotations' / 'training')) == 3


def test_hrf_converter(tmp_path):
    import retina
    rs = np.random.RandomState(0)
    zips = {}
    for name in ('healthy', 'glaucoma', 'dr'):
        zips[name] = str(tmp_path / f'{name}.zip')
        _flat_zip(zips[name],
                  {f'{i:02d}_{name}.jpg':
                   rs.randint(0, 255, (8, 8, 3), np.uint8)
                   for i in range(15)})
        zips[name + '_m'] = str(tmp_path / f'{name}_m.zip')
        _flat_zip(zips[name + '_m'],
                  {f'{i:02d}_{name}.tif':
                   rs.randint(0, 2, (8, 8), np.uint8) * 255
                   for i in range(15)})
    out = tmp_path / 'out'
    retina.main(['hrf', zips['healthy'], zips['healthy_m'],
                 zips['glaucoma'], zips['glaucoma_m'], zips['dr'],
                 zips['dr_m'], '-o', str(out)])
    assert len(os.listdir(out / 'images' / 'training')) == 15
    assert len(os.listdir(out / 'images' / 'validation')) == 30
    assert len(os.listdir(out / 'annotations' / 'training')) == 15


def test_stare_converter(tmp_path):
    import gzip as gz
    import tarfile

    import retina
    rs = np.random.RandomState(0)

    def tar_of_gz(tar_path, files):
        import io
        with tarfile.open(tar_path, 'w') as tf:
            for name, arr in files.items():
                ok, buf = cv2.imencode('.ppm', arr)
                assert ok
                payload = gz.compress(buf.tobytes())
                info = tarfile.TarInfo(name + '.gz')
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))

    imgs = {f'im{i:04d}.ppm': rs.randint(0, 255, (8, 8, 3), np.uint8)
            for i in range(12)}
    def bin3(shape=(8, 8)):  # .ppm needs 3 channels; real STARE masks
        m = rs.randint(0, 2, shape, np.uint8) * 255
        return np.stack([m, m, m], axis=-1)

    ah = {f'im{i:04d}.ah.ppm': bin3() for i in range(12)}
    vk = {f'im{i:04d}.vk.ppm': bin3() for i in range(12)}
    tar_of_gz(str(tmp_path / 'stare-images.tar'), imgs)
    tar_of_gz(str(tmp_path / 'labels-ah.tar'), ah)
    tar_of_gz(str(tmp_path / 'labels-vk.tar'), vk)
    out = tmp_path / 'out'
    retina.main(['stare', str(tmp_path / 'stare-images.tar'),
                 str(tmp_path / 'labels-ah.tar'),
                 str(tmp_path / 'labels-vk.tar'), '-o', str(out)])
    assert len(os.listdir(out / 'images' / 'training')) == 10
    assert len(os.listdir(out / 'images' / 'validation')) == 2
    assert len(os.listdir(out / 'annotations' / 'training')) == 20


def test_voc_aug_converter(tmp_path):
    from scipy.io import savemat

    import voc_aug
    rs = np.random.RandomState(0)
    # tiny devkit + SBD trees; 3 aug-train + 1 ori-train + 1 val
    sbd_cls = tmp_path / 'sbd' / 'dataset' / 'cls'
    os.makedirs(sbd_cls)
    names = [f'2007_{i:06d}' for i in range(4)]
    for n in names[:3] + [names[3]]:
        mask = rs.randint(0, 21, (8, 8)).astype(np.uint8)
        savemat(str(sbd_cls / f'{n}.mat'),
                {'GTcls': {'Segmentation': mask}})
    with open(tmp_path / 'sbd' / 'dataset' / 'train.txt', 'w') as f:
        f.write('\n'.join(names[:3]) + '\n')
    with open(tmp_path / 'sbd' / 'dataset' / 'val.txt', 'w') as f:
        f.write(names[3] + '\n')
    seg_sets = tmp_path / 'devkit' / 'VOC2012' / 'ImageSets' / \
        'Segmentation'
    os.makedirs(seg_sets)
    with open(seg_sets / 'train.txt', 'w') as f:
        f.write('2007_900000\n')
    with open(seg_sets / 'val.txt', 'w') as f:
        f.write(names[3] + '\n')

    import importlib
    importlib.reload(voc_aug)
    voc_aug.AUG_LEN = 4  # scaled-down corpus
    out = tmp_path / 'aug_out'
    voc_aug.main([str(tmp_path / 'devkit'), str(tmp_path / 'sbd'),
                  '-o', str(out)])
    assert len(os.listdir(out)) == 4
    with open(seg_sets / 'trainaug.txt') as f:
        lines = [l.strip() for l in f]
    assert len(lines) == 4 and names[3] not in lines


def test_pascal_context_mapping():
    from pascal_context import _mapping, class_to_index
    rs = np.random.RandomState(0)
    raw = rs.choice(_mapping, size=(8, 8))
    idx = class_to_index(raw)
    assert idx.dtype == np.uint8
    assert idx.max() < len(_mapping)
    # mapping is the rank of the raw id in the sorted table
    np.testing.assert_array_equal(
        idx, np.searchsorted(_mapping, raw).astype(np.uint8))
