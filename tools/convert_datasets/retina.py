#!/usr/bin/env python
"""Retinal-vessel dataset converters: CHASE_DB1, DRIVE, HRF, STARE.

Torch/mmcv-free rewrites of the reference's four medical converters
(``/root/reference/tools/convert_datasets/{chase_db1,drive,hrf,
stare}.py``) behind one CLI — same archive inputs, same output layout
(``images|annotations / training|validation``), same split rules and
the same ``// 128`` annotation binarisation.

Usage:
    python tools/convert_datasets/retina.py chase_db1 CHASEDB1.zip -o data/CHASE_DB1
    python tools/convert_datasets/retina.py drive training.zip test.zip -o data/DRIVE
    python tools/convert_datasets/retina.py hrf healthy.zip healthy_manualsegm.zip \
        glaucoma.zip glaucoma_manualsegm.zip diabetic_retinopathy.zip \
        diabetic_retinopathy_manualsegm.zip -o data/HRF
    python tools/convert_datasets/retina.py stare stare-images.tar \
        labels-ah.tar labels-vk.tar -o data/STARE
"""
import argparse
import gzip
import os
import os.path as osp
import shutil
import sys
import tarfile
import tempfile
import zipfile

import cv2
import numpy as np

# split rules from the reference converters
CHASE_DB1_LEN = 28 * 3
CHASE_TRAINING_LEN = 60
HRF_LEN = 15
HRF_TRAINING_LEN = 5
STARE_TRAINING_LEN = 10


def _mkdirs(out_dir):
    for a in ('images', 'annotations'):
        for b in ('training', 'validation'):
            os.makedirs(osp.join(out_dir, a, b), exist_ok=True)


def _read(path):
    """imread that also handles .gif (reference uses VideoCapture)."""
    if path.lower().endswith('.gif'):
        cap = cv2.VideoCapture(path)
        ok, img = cap.read()
        cap.release()
        assert ok, f'failed to read gif {path}'
        return img
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    assert img is not None, f'failed to read {path}'
    return img


def _write_img(img, path):
    assert cv2.imwrite(path, img), path


def _write_ann(img, path):
    # "divided by 128" rule: 1 if value >= 128 else 0 (the raw masks
    # are not always exactly {0, 255})
    _write_img((img[:, :, 0] // 128).astype(np.uint8), path)


def _out_name(name):
    return osp.splitext(name)[0] + '.png'


def convert_chase_db1(zip_path, out_dir, tmp_root=None):
    _mkdirs(out_dir)
    with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
        zipfile.ZipFile(zip_path).extractall(tmp)
        names = sorted(os.listdir(tmp))
        assert len(names) == CHASE_DB1_LEN, len(names)
        for split, group in (('training', names[:CHASE_TRAINING_LEN]),
                             ('validation',
                              names[CHASE_TRAINING_LEN:])):
            for n in group:
                img = _read(osp.join(tmp, n))
                kind = 'images' if n.endswith('.jpg') else 'annotations'
                dst = osp.join(out_dir, kind, split, _out_name(n))
                (_write_img if kind == 'images' else _write_ann)(
                    img, dst)


def convert_drive(training_zip, test_zip, out_dir, tmp_root=None):
    _mkdirs(out_dir)
    with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
        zipfile.ZipFile(training_zip).extractall(tmp)
        zipfile.ZipFile(test_zip).extractall(tmp)
        for src_split, split, strip in (
                ('training', 'training', '_training'),
                ('test', 'validation', '_test')):
            img_dir = osp.join(tmp, src_split, 'images')
            for n in sorted(os.listdir(img_dir)):
                img = _read(osp.join(img_dir, n))
                stem = osp.splitext(n)[0].replace(strip, '')
                _write_img(img, osp.join(out_dir, 'images', split,
                                         stem + '.png'))
            for manual in ('1st_manual', '2nd_manual'):
                ann_dir = osp.join(tmp, src_split, manual)
                if not osp.isdir(ann_dir):
                    continue
                for n in sorted(os.listdir(ann_dir)):
                    img = _read(osp.join(ann_dir, n))
                    _write_ann(img, osp.join(out_dir, 'annotations',
                                             split, _out_name(n)))


def convert_hrf(images_zips, ann_zips, out_dir, tmp_root=None):
    _mkdirs(out_dir)
    for zips, kind, writer in ((images_zips, 'images', _write_img),
                               (ann_zips, 'annotations', _write_ann)):
        for zp in zips:
            with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
                zipfile.ZipFile(zp).extractall(tmp)
                names = sorted(os.listdir(tmp))
                assert len(names) == HRF_LEN, (zp, len(names))
                for split, group in (
                        ('training', names[:HRF_TRAINING_LEN]),
                        ('validation', names[HRF_TRAINING_LEN:])):
                    for n in group:
                        writer(_read(osp.join(tmp, n)),
                               osp.join(out_dir, kind, split,
                                        _out_name(n)))


def _extract_tar_of_gz(tar_path, dst, tmp_root=None):
    """stare tars hold per-image .gz files; unpack to flat ppm/ah."""
    os.makedirs(dst, exist_ok=True)
    with tempfile.TemporaryDirectory(dir=tmp_root) as gz_dir:
        with tarfile.open(tar_path) as f:
            f.extractall(gz_dir)
        for n in sorted(os.listdir(gz_dir)):
            out = osp.join(dst, osp.splitext(n)[0])
            with gzip.GzipFile(osp.join(gz_dir, n)) as g, \
                    open(out, 'wb') as o:
                shutil.copyfileobj(g, o)


def convert_stare(image_tar, labels_ah, labels_vk, out_dir,
                  tmp_root=None):
    _mkdirs(out_dir)
    with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
        files = osp.join(tmp, 'files')
        _extract_tar_of_gz(image_tar, files, tmp_root)
        names = sorted(os.listdir(files))
        for split, group in (('training', names[:STARE_TRAINING_LEN]),
                             ('validation',
                              names[STARE_TRAINING_LEN:])):
            for n in group:
                _write_img(_read(osp.join(files, n)),
                           osp.join(out_dir, 'images', split,
                                    _out_name(n)))
    for tar in (labels_ah, labels_vk):
        with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
            files = osp.join(tmp, 'files')
            _extract_tar_of_gz(tar, files, tmp_root)
            names = sorted(os.listdir(files))
            for split, group in (
                    ('training', names[:STARE_TRAINING_LEN]),
                    ('validation', names[STARE_TRAINING_LEN:])):
                for n in group:
                    _write_ann(_read(osp.join(files, n)),
                               osp.join(out_dir, 'annotations', split,
                                        _out_name(n)))


def main(args=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    sub = p.add_subparsers(dest='dataset', required=True)
    c = sub.add_parser('chase_db1')
    c.add_argument('zip_path')
    d = sub.add_parser('drive')
    d.add_argument('training_zip')
    d.add_argument('test_zip')
    h = sub.add_parser('hrf')
    for n in ('healthy', 'healthy_manualsegm', 'glaucoma',
              'glaucoma_manualsegm', 'diabetic_retinopathy',
              'diabetic_retinopathy_manualsegm'):
        h.add_argument(n)
    s = sub.add_parser('stare')
    s.add_argument('image_tar')
    s.add_argument('labels_ah')
    s.add_argument('labels_vk')
    for sp in (c, d, h, s):
        sp.add_argument('-o', '--out-dir', required=True)
        sp.add_argument('--tmp-dir', default=None)
    a = p.parse_args(args)

    if a.dataset == 'chase_db1':
        convert_chase_db1(a.zip_path, a.out_dir, a.tmp_dir)
    elif a.dataset == 'drive':
        convert_drive(a.training_zip, a.test_zip, a.out_dir, a.tmp_dir)
    elif a.dataset == 'hrf':
        convert_hrf(
            [a.healthy, a.glaucoma, a.diabetic_retinopathy],
            [a.healthy_manualsegm, a.glaucoma_manualsegm,
             a.diabetic_retinopathy_manualsegm], a.out_dir, a.tmp_dir)
    elif a.dataset == 'stare':
        convert_stare(a.image_tar, a.labels_ah, a.labels_vk, a.out_dir,
                      a.tmp_dir)
    print('Done!')
    return 0


if __name__ == '__main__':
    sys.exit(main())
