"""Small shared helpers.

``add_prefix`` mirrors ``rsiseg/core/utils/misc.py:2``;
``find_latest_checkpoint`` mirrors ``rsiseg/utils/misc.py:7`` but looks
for Orbax step directories instead of ``iter_*.pth`` files.
"""
from __future__ import annotations

import glob
import os.path as osp
from typing import Optional


def add_prefix(inputs: dict, prefix: str) -> dict:
    """Prefix every key of ``inputs`` with ``f'{prefix}.'``."""
    return {f'{prefix}.{name}': value for name, value in inputs.items()}


def find_latest_checkpoint(path: str) -> Optional[str]:
    """Return the highest-step checkpoint directory under ``path``.

    Checkpoints are saved as ``{work_dir}/ckpt/<step>`` by the Orbax
    checkpointer (see ``pfst_tpu/core/checkpoint.py``).
    """
    if path is None or not osp.exists(path):
        return None
    ckpt_root = osp.join(path, 'ckpt')
    if not osp.exists(ckpt_root):
        return None
    steps = []
    for d in glob.glob(osp.join(ckpt_root, '*')):
        name = osp.basename(d)
        if name.isdigit():
            steps.append(int(name))
    if not steps:
        return None
    return osp.join(ckpt_root, str(max(steps)))
