"""Metric math vs direct numpy references (mirror of the reference's
``tests/test_metrics.py``)."""
import numpy as np

from pfst_tpu.core.evaluation import (eval_metrics, intersect_and_union,
                                      mean_dice, mean_fscore, mean_iou,
                                      pre_eval_to_metrics)


def _naive_metrics(results, gts, num_classes, ignore_index):
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    pred_area = np.zeros(num_classes)
    label_area = np.zeros(num_classes)
    for pred, gt in zip(results, gts):
        mask = gt != ignore_index
        p, g = pred[mask], gt[mask]
        for c in range(num_classes):
            pi, gi = p == c, g == c
            inter[c] += np.sum(pi & gi)
            pred_area[c] += np.sum(pi)
            label_area[c] += np.sum(gi)
            union[c] += np.sum(pi | gi)
    return inter, union, pred_area, label_area


def test_intersect_and_union_matches_naive(rng):
    num_classes = 5
    pred = rng.randint(0, num_classes, (16, 16))
    gt = rng.randint(0, num_classes, (16, 16))
    gt[:3] = 255
    i, u, p, l = [np.asarray(x) for x in intersect_and_union(
        pred, gt, num_classes, 255)]
    ni, nu, np_, nl = _naive_metrics([pred], [gt], num_classes, 255)
    np.testing.assert_array_equal(i, ni)
    np.testing.assert_array_equal(u, nu)
    np.testing.assert_array_equal(p, np_)
    np.testing.assert_array_equal(l, nl)


def test_miou_dice_fscore_formulas(rng):
    num_classes = 4
    results = [rng.randint(0, num_classes, (12, 12)) for _ in range(3)]
    gts = [rng.randint(0, num_classes, (12, 12)) for _ in range(3)]
    i, u, p, l = _naive_metrics(results, gts, num_classes, 255)
    out = eval_metrics(results, gts, num_classes, 255,
                       ['mIoU', 'mDice', 'mFscore'])
    np.testing.assert_allclose(out['IoU'], i / u, rtol=1e-6)
    np.testing.assert_allclose(out['Dice'], 2 * i / (p + l), rtol=1e-6)
    prec, rec = i / p, i / l
    np.testing.assert_allclose(out['Fscore'],
                               2 * prec * rec / (prec + rec), rtol=1e-6)
    np.testing.assert_allclose(out['aAcc'], i.sum() / l.sum(), rtol=1e-6)


def test_pre_eval_streaming_equals_batch(rng):
    num_classes = 3
    results = [rng.randint(0, num_classes, (8, 8)) for _ in range(4)]
    gts = [rng.randint(0, num_classes, (8, 8)) for _ in range(4)]
    pre = [tuple(np.asarray(x) for x in intersect_and_union(
        r, g, num_classes, 255)) for r, g in zip(results, gts)]
    streamed = pre_eval_to_metrics(pre, ['mIoU'])
    batch = eval_metrics(results, gts, num_classes, 255, ['mIoU'])
    np.testing.assert_allclose(streamed['IoU'], batch['IoU'])


def test_reduce_zero_label():
    pred = np.zeros((4, 4), np.int64)
    gt = np.ones((4, 4), np.int64)  # raw label 1 -> class 0
    i, u, p, l = [np.asarray(x) for x in intersect_and_union(
        pred, gt, 2, 255, reduce_zero_label=True)]
    assert i[0] == 16 and l[0] == 16


def test_mean_wrappers(rng):
    results = [rng.randint(0, 3, (8, 8))]
    gts = [rng.randint(0, 3, (8, 8))]
    assert 'IoU' in mean_iou(results, gts, 3, 255)
    assert 'Dice' in mean_dice(results, gts, 3, 255)
    assert 'Fscore' in mean_fscore(results, gts, 3, 255)


def test_get_classes_and_palette_aliases():
    from pfst_tpu.core.evaluation import get_classes, get_palette
    assert get_classes('potsdam') == get_classes('isprs')
    assert len(get_classes('isprs')) == len(get_palette('isprs')) == 6
    assert get_classes('inria') == ('background', 'building')
    assert len(get_classes('cityscapes')) == 19
    assert len(get_palette('cityscapes')) == 19
    assert len(get_classes('season_net')) == 33
    try:
        get_classes('nope')
        raise AssertionError('expected ValueError')
    except ValueError as e:
        assert 'Unrecognized' in str(e)
