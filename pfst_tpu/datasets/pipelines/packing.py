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
    number of images packed (0 writes nothing).

    Re-packing a live directory is safe: each pack writes a fresh
    uniquely-named blob that the (atomically replaced) index points
    to, so a concurrent reader can never pair a new index with an old
    blob or vice versa; readers holding the previous blob mmap keep
    reading it even after the file is unlinked (POSIX)."""
    directory = osp.abspath(directory)
    files = sorted(f for f in os.listdir(directory)
                   if f.lower().endswith(IMAGE_EXTS))
    index: Dict[str, list] = {}
    blob_name = f'{PACK_BIN}.{os.getpid()}.{_next_pack_id()}'
    blob_path = osp.join(directory, blob_name)
    with open(blob_path, 'wb') as f:
        for name in files:
            arr = cv2.imread(osp.join(directory, name),
                             cv2.IMREAD_UNCHANGED)
            if arr is None:
                continue
            index[name] = [f.tell(), list(arr.shape), str(arr.dtype)]
            f.write(np.ascontiguousarray(arr).tobytes())
    if not index:
        os.remove(blob_path)
        return 0
    idx_tmp = osp.join(directory, PACK_IDX + '.tmp')
    with open(idx_tmp, 'w') as f:
        json.dump({'blob': blob_name, 'entries': index}, f)
    os.replace(idx_tmp, osp.join(directory, PACK_IDX))
    # drop stale blobs from previous packs (open mmaps survive unlink)
    for old in os.listdir(directory):
        if (old.startswith(PACK_BIN) and old != blob_name
                and not old.endswith('.tmp')):
            try:
                os.remove(osp.join(directory, old))
            except OSError:
                pass
    invalidate(directory)
    return len(index)


_PACK_COUNTER = [0]


def _next_pack_id() -> int:
    _PACK_COUNTER[0] += 1
    return _PACK_COUNTER[0]


class _Pack:
    def __init__(self, directory: str):
        with open(osp.join(directory, PACK_IDX)) as f:
            raw = json.load(f)
        if 'entries' in raw:
            self.index = raw['entries']
            blob = raw.get('blob', PACK_BIN)
        else:  # legacy flat index
            self.index = raw
            blob = PACK_BIN
        self.blob = np.memmap(osp.join(directory, blob),
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
        has = osp.exists(osp.join(directory, PACK_IDX))
        try:
            _packs[directory] = _Pack(directory) if has else None
        except OSError:
            _packs[directory] = None  # torn/partial pack: disk decode
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
