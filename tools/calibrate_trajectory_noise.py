#!/usr/bin/env python
"""Measure the torch-vs-torch nondeterminism envelope of the 12-step
PFGST trajectory protocol (VERDICT r4 next #3).

``tests/test_uda_trajectory.py`` bounds cross-framework (JAX vs torch)
parameter drift per 2-step segment at ``0.75 x motion + floor``.  This
script turns that constant into a measured floor: it runs the SAME
trajectory protocol twin-vs-twin entirely inside torch, with the only
difference between the twins being the convolution algorithm choice
(oneDNN/mkldnn enabled vs disabled — two legitimate float32 algorithm
families for the same math, the CPU analog of cudnn algorithm
nondeterminism) plus intra-op thread count.  Identical semantics, two
float paths — any drift measured here is pure float noise of the
protocol itself, the irreducible baseline a cross-framework comparison
sits on top of.

Outputs (``artifacts/trajectory_noise_floor_r5.log`` + ``.json``):
  * per-segment max over leaves of elementwise drift/motion ratio
    (the quantity the test bounds at 0.75);
  * per-step |acc_A - acc_B| for every accuracy log var (the discrete
    tie-pixel noise the test's 2.0-point allowance covers);
  * per-step logit-margin spectrum: the fraction of valid pixels whose
    top-2 logit margin is below delta for several delta, together with
    the measured A-vs-B logit perturbation — the data behind the
    tie-pixel argument (a perturbation of size d can only flip pixels
    with margin < 2d).

Run: python tools/calibrate_trajectory_noise.py
(CPU-only, ~3-6 min on the 1-core dev host.)
"""
import copy
import json
import os.path as osp
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, 'tests'))
sys.path.insert(0, REPO)

from test_uda_golden_trace import TorchModel  # noqa: E402
from test_uda_trajectory import (N_STEPS, _make_batch,  # noqa: E402
                                 torch_full_step)


def _twin_pair(seed=0):
    torch.manual_seed(seed)
    student = TorchModel()
    teacher = TorchModel()
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
    return student, teacher


def _flat(model):
    return {k: v.detach().clone() for k, v in
            list(model.named_parameters()) + list(model.named_buffers())}


def _drift_motion(a_now, b_now, a_seg_start):
    """max over leaves of elementwise max|a-b| / max|a - seg_start|,
    plus the raw pair for the worst leaf (floor-free ratio where
    motion is above the test's floor)."""
    worst = (0.0, '', 0.0, 0.0)
    for k in a_now:
        drift = float((a_now[k] - b_now[k]).abs().max())
        motion = float((a_now[k] - a_seg_start[k]).abs().max())
        floor = 2e-3 if ('running_' in k or 'num_batches' in k) \
            else 5e-4
        # the test's bound is drift <= 0.75*motion + floor; report the
        # implied fraction (drift - 0) / motion only where motion is
        # meaningfully above the floor, else the floor absorbs it
        if motion > 2 * floor:
            r = drift / motion
            if r > worst[0]:
                worst = (r, k, drift, motion)
    return worst


def run(n_steps=N_STEPS, resync_every=2, thre_type='all'):
    import test_uda_trajectory as tt
    lr_kwargs = dict(lr=tt.BASE_LR, betas=tt.BETAS,
                     weight_decay=tt.WD, eps=tt.EPS)

    stu_a, tea_a = _twin_pair(0)
    stu_b = copy.deepcopy(stu_a)
    tea_b = copy.deepcopy(tea_a)
    opt_a = torch.optim.AdamW(stu_a.parameters(), **lr_kwargs)
    opt_b = torch.optim.AdamW(stu_b.parameters(), **lr_kwargs)

    rs = np.random.RandomState(42)
    batches = [_make_batch(rs) for _ in range(n_steps)]
    mask_rs = np.random.RandomState(5)
    masks = [(mask_rs.rand(2, tt.SIZE, tt.SIZE) > 0.5).astype(
        np.float32) for _ in range(n_steps)]

    threads_a = max(2, torch.get_num_threads())

    def step_with_algo(mkldnn, threads, *args):
        old = torch.backends.mkldnn.enabled
        old_t = torch.get_num_threads()
        torch.backends.mkldnn.enabled = mkldnn
        torch.set_num_threads(threads)
        try:
            return torch_full_step(*args)
        finally:
            torch.backends.mkldnn.enabled = old
            torch.set_num_threads(old_t)

    seg_a = _flat(stu_a)
    seg_ta = _flat(tea_a)
    report = {'segments': [], 'acc_steps': [], 'margin_steps': []}

    for i in range(n_steps):
        log_a = step_with_algo(True, threads_a,
                               stu_a, tea_a, batches[i], masks[i],
                               thre_type, i, opt_a)
        log_b = step_with_algo(False, 1, stu_b, tea_b, batches[i],
                               masks[i], thre_type, i, opt_b)
        accs = {k: abs(log_a[k] - log_b[k]) for k in log_a
                if k.endswith('acc_seg')}
        lvs = {k: abs(log_a[k] - log_b[k]) /
               max(abs(log_a[k]), abs(log_b[k]), 1e-6)
               for k in log_a if not k.endswith('acc_seg')}
        report['acc_steps'].append(
            {'step': i, 'max_acc_abs_diff': round(max(accs.values()), 4),
             'max_logvar_rel_diff': round(max(lvs.values()), 6)})

        # logit-margin spectrum on the post-step student (twin A) with
        # the A-vs-B logit perturbation measured on identical weights
        img = torch.from_numpy(batches[i]['img']).permute(0, 3, 1, 2)
        with torch.no_grad():
            stu_a.eval()
            torch.backends.mkldnn.enabled = True
            la, _, _ = stu_a(img)
            torch.backends.mkldnn.enabled = False
            lb, _, _ = stu_a(img)
            torch.backends.mkldnn.enabled = True
            stu_a.train()
            up = F.interpolate(la, size=img.shape[2:], mode='bilinear',
                               align_corners=False)
            top2 = torch.topk(up, 2, dim=1).values
            margin = (top2[:, 0] - top2[:, 1]).flatten()
            pert = float((la - lb).abs().max())
            spectrum = {
                f'{d:g}': round(float((margin < d).float().mean()
                                      * 100), 4)
                for d in (1e-3, 4e-3, 1e-2, 4e-2, 1e-1)}
        report['margin_steps'].append(
            {'step': i, 'logit_pert_abs': pert,
             'tie_mass_pct_at_delta': spectrum})

        if (i + 1) % resync_every == 0:
            a_now, ta_now = _flat(stu_a), _flat(tea_a)
            r_s = _drift_motion(a_now, _flat(stu_b), seg_a)
            r_t = _drift_motion(ta_now, _flat(tea_b), seg_ta)
            report['segments'].append({
                'ending_step': i,
                'student_worst_ratio': round(r_s[0], 4),
                'student_worst_leaf': r_s[1],
                'student_drift': r_s[2], 'student_motion': r_s[3],
                'teacher_worst_ratio': round(r_t[0], 4),
                'teacher_worst_leaf': r_t[1],
            })
            # teacher-forcing resync B <- A (optimizer states continue)
            with torch.no_grad():
                stu_b.load_state_dict(stu_a.state_dict())
                tea_b.load_state_dict(tea_a.state_dict())
            seg_a, seg_ta = _flat(stu_a), _flat(tea_a)

    report['summary'] = {
        'max_segment_ratio': max(
            max(s['student_worst_ratio'], s['teacher_worst_ratio'])
            for s in report['segments']),
        'max_acc_abs_diff': max(s['max_acc_abs_diff']
                                for s in report['acc_steps']),
        'max_logit_pert': max(s['logit_pert_abs']
                              for s in report['margin_steps']),
        'max_tie_mass_pct_at_4e-2': max(
            s['tie_mass_pct_at_delta']['0.04']
            for s in report['margin_steps']),
        'protocol': (f'{n_steps} steps, resync every {resync_every}, '
                     f'thre_type={thre_type}, twins differ only by '
                     f'mkldnn on/off + intra-op threads '
                     f'{threads_a}/1'),
    }
    return report


def main():
    out_dir = osp.join(REPO, 'artifacts')
    report = run()
    with open(osp.join(out_dir,
                       'trajectory_noise_floor_r5.json'), 'w') as f:
        json.dump(report, f, indent=1)
    lines = [__doc__.split('\n')[0], '']
    for s in report['segments']:
        lines.append(
            f"segment ending step {s['ending_step']}: "
            f"student drift/motion {s['student_worst_ratio']} "
            f"({s['student_worst_leaf']}; drift {s['student_drift']:.2e}"
            f" / motion {s['student_motion']:.2e}), "
            f"teacher {s['teacher_worst_ratio']}")
    for s in report['acc_steps']:
        lines.append(f"step {s['step']}: max |acc_A-acc_B| "
                     f"{s['max_acc_abs_diff']} pts, max log-var rel "
                     f"diff {s['max_logvar_rel_diff']}")
    for s in report['margin_steps']:
        lines.append(f"step {s['step']}: logit pert "
                     f"{s['logit_pert_abs']:.2e}, tie mass % at "
                     f"delta {s['tie_mass_pct_at_delta']}")
    su = report['summary']
    lines += [
        '',
        f"SUMMARY: max segment drift/motion ratio {su['max_segment_ratio']}"
        f" (test bound 0.75)",
        f"max acc diff {su['max_acc_abs_diff']} pts (test allowance 2.0)",
        f"max measured logit perturbation {su['max_logit_pert']:.2e}",
        f"tie mass at delta=4e-2 (10x the logit-pert scale): "
        f"{su['max_tie_mass_pct_at_4e-2']}% of pixels",
        su['protocol'],
    ]
    text = '\n'.join(lines) + '\n'
    with open(osp.join(out_dir,
                       'trajectory_noise_floor_r5.log'), 'w') as f:
        f.write(text)
    print(text)


if __name__ == '__main__':
    main()
