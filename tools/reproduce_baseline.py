#!/usr/bin/env python
"""mIoU-parity runbook against the released PFST checkpoint.

BASELINE.md step 1 — score the reference's released Potsdam-IRRG ->
Vaihingen-IRRG checkpoint (Google-Drive link in
``/root/reference/README.md:79-83``) on real ISPRS data and check the
±0.3 mIoU parity gate — is ENVIRONMENT-BLOCKED in this workspace (no
real data, no checkpoint download).  This script is the ready-to-run
closure: given the ``.pth`` and the converted data roots it executes
convert -> eval -> gate in one command.

Real run (on a machine with the artifacts):

    python tools/reproduce_baseline.py \
        --checkpoint /path/to/pfst_pots2vaih.pth \
        --vaihingen-root /data/Vaihingen_IRRG_1024 \
        --target-miou <published mIoU>          # TGRS paper table
    # exit code 0 iff |ours - target| <= 0.3

The Vaihingen root must hold the converter's layout
(``tools/convert_datasets/isprs.py``: img_dir/val, ann_dir/val).

Dry run (no artifacts needed; executes the full plumbing on the
synthetic corpus so the script itself stays tested in-repo —
``tests/test_reproduce_baseline.py``):

    python tools/reproduce_baseline.py --dry-run

The dry run generates a tiny synthetic Vaihingen val split, saves a
freshly initialized checkpoint, runs the identical eval path, and
gates the measured mIoU against itself (delta 0, PASS) — proving
convert/eval/gate wiring without claiming accuracy parity.
"""
import argparse
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
sys.path.insert(0, osp.dirname(__file__))

DEFAULT_CONFIG = osp.join(
    osp.dirname(__file__), '..', 'configs', 'pfst',
    'pfst_pots_irrg2vaih_irrg_deeplabv3plus_r50-d8.py')
GATE = 0.3  # mIoU points (BASELINE.json parity budget)


def parse_args(args=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--checkpoint',
                   help='released torch .pth (or an already-converted '
                        'checkpoint dir)')
    p.add_argument('--config', default=DEFAULT_CONFIG)
    p.add_argument('--vaihingen-root',
                   help='converted Vaihingen_IRRG_1024 root')
    p.add_argument('--target-miou', type=float,
                   help='published mIoU to gate against (the repo '
                        'publishes none in-tree — take it from the '
                        'TGRS paper table for Pots-IRRG->Vaih-IRRG)')
    p.add_argument('--tolerance', type=float, default=GATE)
    p.add_argument('--work-dir', default='work_dirs/reproduce_baseline')
    p.add_argument('--dry-run', action='store_true',
                   help='synthetic corpus + fresh checkpoint; tests '
                        'the plumbing, not parity')
    return p.parse_args(args)


def convert_if_torch(ckpt, config, work_dir):
    """.pth -> our checkpoint format via the converter CLI."""
    if osp.isdir(ckpt) or '.pth' not in osp.basename(ckpt):
        return ckpt
    import convert_torch_checkpoint as conv
    out_dir = osp.join(work_dir, 'converted')
    conv.main([ckpt, config, '-o', out_dir])
    return osp.join(out_dir, 'ckpt', '0')


def make_dry_run_fixture(work_dir):
    """Synthetic val split + freshly initialized checkpoint."""
    import make_synthetic_data as synth

    import jax
    import jax.numpy as jnp
    from pfst_tpu.core.checkpoint import save_checkpoint
    from pfst_tpu.models import build_segmentor
    from pfst_tpu.utils import Config

    data_root = osp.join(work_dir, 'Vaihingen_IRRG_1024')
    synth.main(['-o', data_root, '--num-train', '1', '--num-val', '2',
                '--size', '256', '--seed', '1'])

    cfg = Config.fromfile(DEFAULT_CONFIG)
    model_cfg = dict(cfg.model)
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    variables = jax.jit(
        lambda r, im: model.init({'params': r}, im, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt_dir = osp.join(work_dir, 'fresh')
    save_checkpoint(ckpt_dir, 0, jax.device_get(dict(variables)),
                    meta={'source': 'dry-run fresh init'})
    return osp.join(ckpt_dir, 'ckpt', '0'), data_root


def main(args=None):
    args = parse_args(args)
    os.makedirs(args.work_dir, exist_ok=True)

    if args.dry_run:
        ckpt, vaih_root = make_dry_run_fixture(args.work_dir)
    else:
        if not args.checkpoint:
            sys.exit('need --checkpoint (or --dry-run); the released '
                     '.pth link is in /root/reference/README.md:79-83')
        ckpt = convert_if_torch(args.checkpoint, args.config,
                                args.work_dir)
        vaih_root = args.vaihingen_root

    import test as test_cli
    cli = [args.config, ckpt, '--eval', 'mIoU',
           '--out', osp.join(args.work_dir, 'eval.json')]
    if vaih_root:
        cli += ['--cfg-options', f'data.test.data_root={vaih_root}']
    if args.dry_run:
        # small tiles so the plumbing check stays cheap; the real run
        # keeps the reference's full 1024^2 TTA pipeline
        cli += ['data.test.pipeline.1.img_scale=(256,256)']
    res = test_cli.main(cli)
    miou = float(res['mIoU']) * 100.0  # evaluate() returns fractions

    target = miou if args.dry_run and args.target_miou is None \
        else args.target_miou
    print(f'\nmeasured mIoU: {miou:.2f}')
    if target is None:
        print('no --target-miou given: gate NOT evaluated. The parity '
              'gate needs the published number (TGRS paper) — this '
              'repo inherits BASELINE.md\'s "not published in-repo" '
              'state.')
        return 0
    delta = miou - target
    ok = abs(delta) <= args.tolerance
    print(f'target mIoU:   {target:.2f}')
    print(f'delta:         {delta:+.2f} (gate ±{args.tolerance})')
    print('PARITY GATE:  ', 'PASS' if ok else 'FAIL')
    if args.dry_run:
        print('(dry run: plumbing check only — NOT accuracy parity)')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
