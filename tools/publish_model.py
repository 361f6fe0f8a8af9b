#!/usr/bin/env python
"""Publish a trained checkpoint: strip optimizer/teacher state, keep
student params + batch stats, stamp a content hash
(mirror of /root/reference/tools/publish_model.py)."""
import argparse
import hashlib
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('in_ckpt', help='orbax checkpoint dir')
    p.add_argument('out_dir', help='output dir for the published ckpt')
    a = p.parse_args(args)

    import jax
    import numpy as np
    from pfst_tpu.core.checkpoint import (extract_student,
                                          load_checkpoint,
                                          save_checkpoint)

    restored = load_checkpoint(a.in_ckpt)
    student = extract_student(restored)
    # content hash over concatenated leaves (like sha256 .pth stamping)
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(student):
        h.update(np.ascontiguousarray(leaf).tobytes())
    digest = h.hexdigest()[:8]
    path = save_checkpoint(a.out_dir, 0, student,
                           meta={'sha256': digest})
    print(f'published {path} (sha256 {digest})')


if __name__ == '__main__':
    main()
