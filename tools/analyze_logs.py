#!/usr/bin/env python
"""Training-log analysis
(mirror of /root/reference/tools/analyze_logs.py).

Parses the text logs written by the train loop
(``Iter [N/M] time: ... key: value`` lines) and plots curves or prints
timing statistics.
"""
import argparse
import os.path as osp
import re
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

LINE_RE = re.compile(
    r'Iter \[(\d+)/(\d+)\] time: ([\d.]+)s data: ([\d.]+)s\s+(.*)')


def parse_log(path):
    records = []
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if not m:
                continue
            it, total, t, d, rest = m.groups()
            rec = {'iter': int(it), 'time': float(t),
                   'data_time': float(d)}
            for kv in rest.split(','):
                if ':' in kv:
                    k, v = kv.rsplit(':', 1)
                    try:
                        rec[k.strip()] = float(v)
                    except ValueError:
                        pass
            records.append(rec)
    return records


def main(args=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='task', required=True)
    pc = sub.add_parser('plot_curve')
    pc.add_argument('json_logs', nargs='+')
    pc.add_argument('--keys', nargs='+', default=['loss'])
    pc.add_argument('--out', default=None)
    pc.add_argument('--title', default=None)
    pc.add_argument('--legend', nargs='+', default=None)
    ct = sub.add_parser('cal_train_time')
    ct.add_argument('json_logs', nargs='+')
    a = p.parse_args(args)

    if a.task == 'cal_train_time':
        for path in a.json_logs:
            recs = parse_log(path)
            if not recs:
                print(f'{path}: no records')
                continue
            times = [r['time'] for r in recs]
            print(f'{path}: {len(recs)} records  '
                  f'avg iter time {sum(times) / len(times):.4f}s  '
                  f'fastest {min(times):.4f}s  slowest {max(times):.4f}s')
        return

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for path in a.json_logs:
        recs = parse_log(path)
        for key in a.keys:
            xs = [r['iter'] for r in recs if key in r]
            ys = [r[key] for r in recs if key in r]
            label = f'{osp.basename(path)}:{key}' \
                if a.legend is None else a.legend.pop(0)
            ax.plot(xs, ys, label=label)
    ax.set_xlabel('iter')
    ax.legend()
    if a.title:
        ax.set_title(a.title)
    out = a.out or 'curves.png'
    fig.savefig(out)
    print(f'saved {out}')


if __name__ == '__main__':
    main()
