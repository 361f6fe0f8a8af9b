"""Segmentation metrics (mirror of ``rsiseg/core/evaluation/metrics.py``).

Per-image (intersect, union, pred_area, label_area) histograms are
computed on device with a fused one-hot matmul-free bincount, streamed
into a running accumulator (the reference's ``pre_eval`` protocol,
``custom.py:644-683``), then converted to IoU/Dice/Fscore/acc tables.
Under pjit the per-batch histograms reduce with a single tiny ``psum``.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def intersect_and_union(pred_label,
                        label,
                        num_classes: int,
                        ignore_index: int,
                        label_map: Optional[dict] = None,
                        reduce_zero_label: bool = False):
    """Histograms for a single (or batched) prediction.

    Mirrors ``metrics.py:26-87``: applies ``label_map`` /
    ``reduce_zero_label`` to the label, masks ``ignore_index`` pixels
    out of *both* maps, and returns four (num_classes,) histograms.

    Works on jnp or np arrays; shapes (H, W) or (B, H, W).
    """
    pred_label = jnp.asarray(pred_label)
    label = jnp.asarray(label)
    if label_map:
        out = label
        for old_id, new_id in label_map.items():
            out = jnp.where(label == old_id, new_id, out)
        label = out
    if reduce_zero_label:
        label = jnp.where(label == 0, 255, label - 1)
        label = jnp.where(label == 254, 255, label)

    valid = (label != ignore_index)
    # bincount with masking: ignored pixels counted into a scrap bin
    scrap = num_classes
    lbl = jnp.where(valid, label, scrap).astype(jnp.int32)
    prd = jnp.where(valid, pred_label, scrap).astype(jnp.int32)
    inter = jnp.where(prd == lbl, prd, scrap)

    def hist(x):
        # float32 on device (jax default); host accumulation upcasts to
        # float64 in total_intersect_and_union / pre_eval_to_metrics.
        return jnp.bincount(x.reshape(-1), length=num_classes + 1
                            )[:num_classes].astype(jnp.float32)

    area_intersect = hist(inter)
    area_pred = hist(prd)
    area_label = hist(lbl)
    area_union = area_pred + area_label - area_intersect
    return area_intersect, area_union, area_pred, area_label


def total_intersect_and_union(results, gt_seg_maps, num_classes,
                              ignore_index, label_map=None,
                              reduce_zero_label=False):
    """Accumulate over a corpus (``metrics.py:89``)."""
    total = [np.zeros((num_classes,), np.float64) for _ in range(4)]
    for res, gt in zip(results, gt_seg_maps):
        parts = intersect_and_union(res, gt, num_classes, ignore_index,
                                    label_map, reduce_zero_label)
        for t, p in zip(total, parts):
            t += np.asarray(p)
    return tuple(total)


def f_score(precision, recall, beta=1):
    score = (1 + beta**2) * (precision * recall) / (
        (beta**2 * precision) + recall)
    return score


def total_area_to_metrics(total_area_intersect,
                          total_area_union,
                          total_area_pred_label,
                          total_area_label,
                          metrics: Union[str, Sequence[str]] = ['mIoU'],
                          nan_to_num: Optional[int] = None,
                          beta: int = 1) -> Dict[str, np.ndarray]:
    """Histograms -> metric table (``metrics.py:300-395``)."""
    if isinstance(metrics, str):
        metrics = [metrics]
    allowed = ['mIoU', 'mDice', 'mFscore']
    if not set(metrics).issubset(set(allowed)):
        raise KeyError(f'metrics {metrics} is not supported')

    total_area_intersect = np.asarray(total_area_intersect, np.float64)
    total_area_union = np.asarray(total_area_union, np.float64)
    total_area_pred_label = np.asarray(total_area_pred_label, np.float64)
    total_area_label = np.asarray(total_area_label, np.float64)

    with np.errstate(divide='ignore', invalid='ignore'):
        all_acc = total_area_intersect.sum() / total_area_label.sum()
        ret: Dict[str, np.ndarray] = OrderedDict({'aAcc': all_acc})
        for metric in metrics:
            if metric == 'mIoU':
                iou = total_area_intersect / total_area_union
                acc = total_area_intersect / total_area_label
                ret['IoU'] = iou
                ret['Acc'] = acc
            elif metric == 'mDice':
                dice = 2 * total_area_intersect / (
                    total_area_pred_label + total_area_label)
                acc = total_area_intersect / total_area_label
                ret['Dice'] = dice
                ret['Acc'] = acc
            elif metric == 'mFscore':
                precision = total_area_intersect / total_area_pred_label
                recall = total_area_intersect / total_area_label
                fv = np.array([
                    f_score(p, r, beta)
                    for p, r in zip(precision, recall)
                ])
                ret['Fscore'] = fv
                ret['Precision'] = precision
                ret['Recall'] = recall
    if nan_to_num is not None:
        ret = OrderedDict({
            m: np.nan_to_num(v, nan=nan_to_num) for m, v in ret.items()
        })
    return ret


def pre_eval_to_metrics(pre_eval_results,
                        metrics=['mIoU'],
                        nan_to_num=None,
                        beta=1):
    """List of per-image 4-tuples -> metrics (``metrics.py:256``)."""
    pre_eval_results = tuple(zip(*pre_eval_results))
    assert len(pre_eval_results) == 4
    sums = [np.sum(np.stack([np.asarray(x) for x in r]), axis=0)
            for r in pre_eval_results]
    return total_area_to_metrics(*sums, metrics=metrics,
                                 nan_to_num=nan_to_num, beta=beta)


def eval_metrics(results,
                 gt_seg_maps,
                 num_classes,
                 ignore_index,
                 metrics=['mIoU'],
                 nan_to_num=None,
                 label_map=None,
                 reduce_zero_label=False,
                 beta=1):
    """End-to-end corpus evaluation (``metrics.py:300``)."""
    totals = total_intersect_and_union(results, gt_seg_maps, num_classes,
                                       ignore_index, label_map,
                                       reduce_zero_label)
    return total_area_to_metrics(*totals, metrics=metrics,
                                 nan_to_num=nan_to_num, beta=beta)


def mean_iou(results, gt_seg_maps, num_classes, ignore_index,
             nan_to_num=None, label_map=None, reduce_zero_label=False):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ['mIoU'], nan_to_num, label_map,
                        reduce_zero_label)


def mean_dice(results, gt_seg_maps, num_classes, ignore_index,
              nan_to_num=None, label_map=None, reduce_zero_label=False):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ['mDice'], nan_to_num, label_map,
                        reduce_zero_label)


def mean_fscore(results, gt_seg_maps, num_classes, ignore_index,
                nan_to_num=None, label_map=None, reduce_zero_label=False,
                beta=1):
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        ['mFscore'], nan_to_num, label_map,
                        reduce_zero_label, beta)
