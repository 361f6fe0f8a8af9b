#!/usr/bin/env python
"""Evaluation CLI (mirror of /root/reference/tools/test.py).

Usage: python tools/test.py <config> <checkpoint> --eval mIoU
The ``--revise_checkpoint_key`` flag is accepted for command
compatibility; UDA checkpoints are detected structurally and the
student weights are extracted automatically
(reference ``tools/test.py:237-242``).
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from pfst_tpu.utils import Config, DictAction, get_root_logger


def parse_args(args=None):
    parser = argparse.ArgumentParser(description='Test a segmentor')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--eval', nargs='+',
                        help='metrics: mIoU/mDice/mFscore')
    parser.add_argument('--out', help='json file to dump results')
    parser.add_argument('--format-only', action='store_true')
    parser.add_argument('--imgfile-prefix', default='work_dirs/format',
                        help='output dir for --format-only pngs')
    parser.add_argument('--aug-test', action='store_true',
                        help='multi-scale + flip TTA')
    parser.add_argument('--show-dir', help='dir to save viz overlays')
    parser.add_argument('--opacity', type=float, default=0.5)
    parser.add_argument('--revise_checkpoint_key', type=bool,
                        default=False, help='compat no-op')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction)
    parser.add_argument('--eval-options', nargs='+', action=DictAction)
    parser.add_argument('--quant-int8', action='store_true',
                        help='int8-PTQ convolutions (MXU s8 mode); '
                             'see pfst_tpu/ops/quant.py')
    parser.add_argument('--act-scales', default=None,
                        help='static activation-scale JSON from '
                             'tools/calibrate_int8.py (default: '
                             'dynamic in-trace scales)')
    parser.add_argument('--device-normalize', nargs='?', const='uint8',
                        default=None, choices=['uint8', 'float16'],
                        help='ship eval images over the host->device '
                             'link in the 0-255 domain and normalize '
                             'on device (uint8 = 4x fewer bytes; '
                             'bit-exact for integer-valued inputs, '
                             'sub-LSB rounding after float resizes)')
    parser.add_argument('--spatial', type=int, default=0,
                        help='shard each whole-image forward\'s H'
                             ' axis over this many devices (GSPMD'
                             ' halo exchange; parallel/spatial.py) —'
                             ' evaluates scenes too large for one'
                             ' chip; non-divisible heights are'
                             ' edge-padded')
    parser.add_argument('--launcher', default='none')
    parser.add_argument('--local_rank', type=int, default=0)
    return parser.parse_args(args)


def main(args=None):
    args = parse_args(args)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    logger = get_root_logger()

    coordinator = os.environ.get('COORDINATOR_ADDRESS')
    if args.launcher == 'jax' or coordinator:
        # multi-host eval: same init as tools/train.py — must run
        # before any jax API touches a backend
        from pfst_tpu.parallel import init_distributed
        np_env = os.environ.get('NUM_PROCESSES')
        pid_env = os.environ.get('PROCESS_ID')
        init_distributed(coordinator,
                         int(np_env) if np_env else None,
                         int(pid_env) if pid_env else None)

    if args.aug_test:
        tta = cfg.data['test']['pipeline'][1]
        tta['img_ratios'] = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
        tta['flip'] = True

    if args.device_normalize:
        # narrow the eval wire (single_gpu_test detects the deferred
        # pipeline from the metas and normalizes on device)
        from pfst_tpu.datasets.pipelines import DeferNormalize
        if DeferNormalize.swap_into(cfg.data['test']['pipeline'],
                                    args.device_normalize) is None:
            print('warning: --device-normalize: no Normalize in the '
                  'test pipeline; running unchanged', file=sys.stderr)

    from pfst_tpu.utils.set_env import setup_environment
    setup_environment(cfg)
    import jax

    from pfst_tpu.apis import multi_gpu_test, single_gpu_test
    from pfst_tpu.core.checkpoint import extract_student, load_checkpoint
    from pfst_tpu.datasets import build_dataloader, build_dataset
    from pfst_tpu.models import build_segmentor

    dataset = build_dataset({**cfg.data['test'], 'test_mode': True})
    loader = build_dataloader(dataset, 1, cfg.data.get(
        'workers_per_gpu', 2), shuffle=False)

    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    restored = load_checkpoint(args.checkpoint)
    variables = extract_student(restored)

    test_fn = multi_gpu_test if jax.local_device_count() > 1 \
        else single_gpu_test
    extra = {}
    if args.spatial:
        # spatial shards ONE forward across devices (memory-bound
        # scenes); image-sharded multi_gpu_test is the throughput
        # layout — they don't compose, spatial wins when asked for
        test_fn = single_gpu_test
        extra['spatial'] = args.spatial
    if args.quant_int8:
        extra['quant_int8'] = True
        if args.act_scales:
            import json as _json
            with open(args.act_scales) as f:
                extra['act_scales'] = _json.load(f)
    results = test_fn(
        model, variables, loader,
        pre_eval=bool(args.eval) and not args.format_only,
        format_only=args.format_only, out_dir=args.show_dir, **extra)

    if args.format_only:
        files = dataset.format_results(results, args.imgfile_prefix)
        logger.info(f'{len(files)} result maps written to '
                    f'{args.imgfile_prefix}')

    if args.eval:
        eval_kwargs = dict(args.eval_options or {})
        res = dataset.evaluate(results, metric=args.eval, logger=logger,
                               **eval_kwargs)
        if args.out:
            with open(args.out, 'w') as f:
                json.dump({k: float(v) for k, v in res.items()}, f,
                          indent=2)
        return res


if __name__ == '__main__':
    main()
