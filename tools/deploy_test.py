#!/usr/bin/env python
"""Evaluate an exported SavedModel against a dataset
(mirror of /root/reference/tools/deploy_test.py, which scores
ONNX/TensorRT engines)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import cv2
import numpy as np

from pfst_tpu.utils import Config, DictAction


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('saved_model', help='dir from export_savedmodel.py')
    p.add_argument('--eval', nargs='+', default=['mIoU'])
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    a = p.parse_args(args)
    cfg = Config.fromfile(a.config)
    if a.cfg_options:
        cfg.merge_from_dict(a.cfg_options)

    import tensorflow as tf
    from pfst_tpu.datasets import build_dataset

    module = tf.saved_model.load(a.saved_model)
    serve = module.serve
    in_shape = serve.input_signature[0].shape
    h, w = int(in_shape[1]), int(in_shape[2])

    dataset = build_dataset({**cfg.data['test'], 'test_mode': True})
    results = []
    for idx in range(len(dataset)):
        s = dataset[idx]
        img = s['img'][0] if isinstance(s['img'], list) else s['img']
        ih, iw = img.shape[:2]
        if ih > h or iw > w:
            # image exceeds the exported input: run at export size and
            # nearest-upsample the label map back — cropping would
            # score a partial prediction against the full-size gt
            small = cv2.resize(img, (w, h),
                               interpolation=cv2.INTER_LINEAR)
            pred = np.asarray(serve(small[None]))[0]
            pred = cv2.resize(pred.astype(np.uint8), (iw, ih),
                              interpolation=cv2.INTER_NEAREST)
            results.extend(dataset.pre_eval(pred, idx))
            continue
        pad = np.zeros((h, w, img.shape[2]), np.float32)
        pad[:ih, :iw] = img
        pred = np.asarray(serve(pad[None]))[0]
        results.extend(dataset.pre_eval(pred[:ih, :iw], idx))
    res = dataset.evaluate(results, metric=a.eval)
    print(res)
    return res


if __name__ == '__main__':
    main()
