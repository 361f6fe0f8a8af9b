"""ctypes loader/builder for the native host-augmentation kernels.

Builds ``hostaug.cc`` with g++ on first use (cached next to the
source, keyed by a source hash; falls back to ``~/.cache/pfst_tpu``
when the package directory is read-only).  All entry points degrade
to the cv2/numpy path when the toolchain is missing — the native
kernel is an accelerator, never a requirement.

Bit-exactness vs the cv2 path is enforced by exhaustive tests
(``tests/test_native_hostaug.py``: full 2^24 BGR cube and full
HSV cube).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_SRC = osp.join(osp.dirname(__file__), 'hostaug.cc')
_lock = threading.Lock()
_lib = None
_tried = False


def _build_dir():
    d = osp.dirname(__file__)
    if os.access(d, os.W_OK):
        return d
    d = osp.join(osp.expanduser('~'), '.cache', 'pfst_tpu')
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get('PFST_NATIVE', '1') == '0':
            return None
        try:
            with open(_SRC, 'rb') as f:
                tag = hashlib.sha256(f.read()).hexdigest()[:12]
            so = osp.join(_build_dir(), f'_hostaug_{tag}.so')
            if not osp.exists(so):
                tmp = so + f'.tmp{os.getpid()}'
                subprocess.run(
                    ['g++', '-O3', '-ffp-contract=off', '-shared',
                     '-fPIC', '-o', tmp, _SRC],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            for name, argtypes in (
                    ('hsv_modify_u8',
                     [u8p, u8p, ctypes.c_int64, u8p, u8p]),
                    ('bgr2hsv_u8', [u8p, u8p, ctypes.c_int64]),
                    ('hsv2bgr_u8', [u8p, u8p, ctypes.c_int64]),
                    ('apply_lut_u8',
                     [u8p, u8p, ctypes.c_int64, u8p])):
                fn = getattr(lib, name)
                fn.argtypes = argtypes
                fn.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _as_c_u8(img):
    img = np.asarray(img, np.uint8)
    if not img.flags.c_contiguous:
        img = np.ascontiguousarray(img)
    return img


def hsv_modify(img, sat_lut=None, hue_lut=None):
    """Fused BGR->HSV->{S,H LUT}->BGR on an (H, W, 3) uint8 image."""
    lib = _load()
    img = _as_c_u8(img)
    out = np.empty_like(img)
    npix = img.shape[0] * img.shape[1]
    lib.hsv_modify_u8(
        _u8p(img), _u8p(out), npix,
        _u8p(_as_c_u8(sat_lut)) if sat_lut is not None else None,
        _u8p(_as_c_u8(hue_lut)) if hue_lut is not None else None)
    return out


def bgr2hsv(img):
    lib = _load()
    img = _as_c_u8(img)
    out = np.empty_like(img)
    lib.bgr2hsv_u8(_u8p(img), _u8p(out),
                   img.shape[0] * img.shape[1])
    return out


def hsv2bgr(img):
    lib = _load()
    img = _as_c_u8(img)
    out = np.empty_like(img)
    lib.hsv2bgr_u8(_u8p(img), _u8p(out),
                   img.shape[0] * img.shape[1])
    return out
