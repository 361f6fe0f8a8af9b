"""Packed image store: one mmap-able blob + JSON index per directory.

Eliminates per-sample PNG/TIFF decode — the dominant host cost of the
loader pipeline on large corpora (PERF.md loader table: ~83 ms/sample
at 1024², most of it imdecode once the LRU decode cache misses).  The
reference's analog is Dataset4EO's datapipe materialization
(``rsiseg/datasets/custom.py:52-62`` materializes ``img_infos`` but
still decodes per access); here decode happens ONCE at pack time.

Integration point is ``imread`` itself
(``pfst_tpu/datasets/pipelines/loading.py``), so no config or pipeline
change is needed:

    python tools/pack_dataset.py data/Potsdam_IRRG_1024 --recursive

drops ``.pfst_pack.bin`` / ``.pfst_pack.json`` next to the images and
every ``LoadImageFromFile`` / ``LoadAnnotations`` touching that
directory reads a memmap slice instead of decoding.  The blob is
shared page cache across thread AND forked process workers.  Files
not in the pack (added later) silently fall back to disk decode;
re-run the tool after changing a directory.
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Optional

import cv2
import numpy as np

PACK_BIN = '.pfst_pack.bin'
PACK_IDX = '.pfst_pack.json'
IMAGE_EXTS = ('.png', '.jpg', '.jpeg', '.tif', '.tiff', '.bmp')


def pack_directory(directory: str) -> int:
    """Decode every image in ``directory`` (IMREAD_UNCHANGED — the
    lossless representation) into one flat blob + index.  Returns the
    number of images packed (0 writes nothing)."""
    directory = osp.abspath(directory)
    files = sorted(f for f in os.listdir(directory)
                   if f.lower().endswith(IMAGE_EXTS))
    index: Dict[str, list] = {}
    bin_tmp = osp.join(directory, PACK_BIN + '.tmp')
    with open(bin_tmp, 'wb') as f:
        for name in files:
            arr = cv2.imread(osp.join(directory, name),
                             cv2.IMREAD_UNCHANGED)
            if arr is None:
                continue
            index[name] = [f.tell(), list(arr.shape), str(arr.dtype)]
            f.write(np.ascontiguousarray(arr).tobytes())
    if not index:
        os.remove(bin_tmp)
        return 0
    with open(osp.join(directory, PACK_IDX + '.tmp'), 'w') as f:
        json.dump(index, f)
    # blob first so a reader never sees an index without its data
    os.replace(bin_tmp, osp.join(directory, PACK_BIN))
    os.replace(osp.join(directory, PACK_IDX + '.tmp'),
               osp.join(directory, PACK_IDX))
    invalidate(directory)
    return len(index)


class _Pack:
    def __init__(self, directory: str):
        with open(osp.join(directory, PACK_IDX)) as f:
            self.index = json.load(f)
        self.blob = np.memmap(osp.join(directory, PACK_BIN),
                              np.uint8, mode='r')

    def get(self, name: str, color: bool,
            unchanged: bool) -> Optional[np.ndarray]:
        ent = self.index.get(name)
        if ent is None:
            return None
        offset, shape, dtype = ent
        dt = np.dtype(dtype)
        n = int(np.prod(shape))
        arr = np.frombuffer(self.blob, dt, count=n,
                            offset=offset).reshape(shape)
        if unchanged:
            return arr.copy()  # writable, like cv2.imread
        if color:
            if arr.ndim == 2 and dt == np.uint8:
                return cv2.cvtColor(arr, cv2.COLOR_GRAY2BGR)
            if arr.ndim == 3 and arr.shape[2] == 3 and dt == np.uint8:
                return arr.copy()
            if arr.ndim == 3 and arr.shape[2] == 4 and dt == np.uint8:
                return cv2.cvtColor(arr, cv2.COLOR_BGRA2BGR)
            return None  # exotic (uint16 color, …): disk decode
        # grayscale request
        if arr.ndim == 2 and dt == np.uint8:
            return arr.copy()
        # grayscale-of-color: cv2's DECODER-level conversion rounds
        # differently (±1) than cvtColor on decoded BGR — stay exact
        # by deferring to the real decoder
        return None


_packs: Dict[str, Optional[_Pack]] = {}


def lookup(path: str, color: bool = True,
           unchanged: bool = False) -> Optional[np.ndarray]:
    """Packed read of ``path`` honoring ``imread`` mode semantics, or
    None (no pack for the directory / file not packed / mode needs the
    real decoder)."""
    directory, name = osp.split(osp.abspath(path))
    if directory not in _packs:
        has = (osp.exists(osp.join(directory, PACK_IDX))
               and osp.exists(osp.join(directory, PACK_BIN)))
        _packs[directory] = _Pack(directory) if has else None
    pack = _packs[directory]
    if pack is None:
        return None
    return pack.get(name, color, unchanged)


def invalidate(directory: Optional[str] = None) -> None:
    """Drop cached pack handles (after re-packing, or in tests)."""
    if directory is None:
        _packs.clear()
    else:
        _packs.pop(osp.abspath(directory), None)
