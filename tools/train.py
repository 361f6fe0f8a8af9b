#!/usr/bin/env python
"""Training CLI (mirror of /root/reference/tools/train.py).

Usage: python tools/train.py <config> [--work-dir D] [--resume-from C]
       [--auto-resume] [--seed N] [--cfg-options k=v ...]
"""
import argparse
import copy
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from pfst_tpu.utils import Config, DictAction, get_root_logger


def parse_args(args=None):
    parser = argparse.ArgumentParser(description='Train a segmentor')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--work-dir', help='the dir to save logs/models')
    parser.add_argument('--load-from', help='checkpoint to load weights')
    parser.add_argument('--resume-from', help='checkpoint to resume')
    parser.add_argument('--auto-resume', action='store_true',
                        help='resume from the latest checkpoint')
    parser.add_argument('--no-validate', action='store_true',
                        help='skip evaluation during training')
    parser.add_argument('--seed', type=int, default=None,
                        help='random seed')
    parser.add_argument('--deterministic', action='store_true')
    parser.add_argument('--max-iters', type=int, default=None,
                        help='override runner.max_iters')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        help='override config entries key=value')
    parser.add_argument('--launcher', default='none',
                        choices=['none', 'jax'],
                        help='jax launcher uses jax.distributed '
                             '(COORDINATOR_ADDRESS env)')
    parser.add_argument('--coordinator', default=None,
                        help='multi-host coordinator address host:port '
                             '(implies --launcher jax)')
    parser.add_argument('--num-processes', type=int, default=None,
                        help='total number of hosts in the job')
    parser.add_argument('--process-id', type=int, default=None,
                        help='this host\'s index in [0, num_processes)')
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument('--tp', type=int, default=None,
                        help='tensor-parallel degree: shard transformer'
                        ' block weights over this many devices (the'
                        ' rest form the data axis); equivalent to'
                        ' --cfg-options parallel.tp=N')
    parser.add_argument('--sp', type=int, default=None,
                        help='spatial-parallel degree: shard the'
                        ' training crop\'s H axis over this many'
                        ' devices (GSPMD halo exchange; exact global'
                        ' sync-BN semantics) — trains crops too tall'
                        ' for one chip; equivalent to --cfg-options'
                        ' parallel.sp=N')
    parser.add_argument('--zero', nargs='?', const=1, default=None,
                        type=int, choices=[1, 3],
                        help='ZeRO optimizer-state sharding over the'
                        ' data axis: --zero (or --zero 1) partitions'
                        ' the AdamW moments; --zero 3 (FSDP) also'
                        ' partitions the param/teacher trees;'
                        ' equivalent to --cfg-options parallel.zero=N')
    return parser.parse_args(args)


def _env_int(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def main(args=None):
    args = parse_args(args)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    if args.tp:
        cfg.merge_from_dict({'parallel.tp': args.tp})
    if args.sp:
        cfg.merge_from_dict({'parallel.sp': args.sp})
    if args.zero:
        cfg.merge_from_dict({'parallel.zero': args.zero})

    coordinator = args.coordinator or os.environ.get(
        'COORDINATOR_ADDRESS')
    if args.launcher == 'jax' or args.coordinator:
        # multi-host init (the reference's init_dist,
        # ``apis/train.py:104-117`` / ``tools/train.py:150-157``) —
        # must run before any other jax API touches a backend
        from pfst_tpu.parallel import init_distributed
        num_processes = args.num_processes or _env_int(
            'NUM_PROCESSES')
        process_id = args.process_id if args.process_id is not None \
            else _env_int('PROCESS_ID')
        init_distributed(coordinator, num_processes, process_id)

    work_dir = args.work_dir or cfg.get('work_dir') or osp.join(
        'work_dirs', osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    timestamp = time.strftime('%Y%m%d_%H%M%S', time.localtime())
    logger = get_root_logger(osp.join(work_dir, f'{timestamp}.log'))
    cfg.dump(osp.join(work_dir, osp.basename(args.config)))

    from pfst_tpu.utils.set_env import setup_environment
    setup_environment(cfg)
    import jax
    seed = args.seed if args.seed is not None else cfg.get('seed', 0)
    from pfst_tpu.utils.collect_env import collect_env
    env_info = '\n'.join(f'{k}: {v}'
                         for k, v in collect_env().items())
    logger.info('Environment info:\n' + '-' * 40 + f'\n{env_info}\n' +
                '-' * 40)
    logger.info(f'devices: {jax.devices()}  seed: {seed}')
    logger.info(f'Config:\n{cfg.dump()}')

    meta = dict(
        config=cfg.dump(),
        seed=seed,
        exp_name=osp.basename(args.config),
        time=timestamp,
    )

    from pfst_tpu.apis import train_segmentor
    from pfst_tpu.datasets import build_dataset
    try:
        ds = build_dataset(cfg.data['train'])
        meta['CLASSES'] = list(ds.CLASSES) if ds.CLASSES else None
        meta['PALETTE'] = list(ds.PALETTE) if ds.PALETTE else None
    except Exception as e:  # dataset may need data on disk for meta only
        logger.warning(f'could not record dataset meta: {e}')

    train_segmentor(
        cfg,
        work_dir=work_dir,
        resume_from=args.resume_from,
        load_from=args.load_from,
        auto_resume=args.auto_resume,
        validate=not args.no_validate,
        seed=seed,
        meta=meta,
        max_iters_override=args.max_iters)


if __name__ == '__main__':
    main()
