"""Learning-curve plotting from progress.txt trees.

Behavioral rebuild of the reference's plotters
(reference: safe_rl_libX/guard_utils/plot.py:15-260, plot_all.py): walk log
dirs for progress.txt + config.json, concatenate seeds into a pandas frame,
seaborn lineplot with sd error bands, optional moving-window smoothing,
select/exclude filters, and the --reward/--cost dual-plot mode of
plot_all.py. Saves PNGs instead of blocking on plt.show() (headless TPU
hosts).

Usage:
    python -m guardx_tpu.utils.plot ./logs --value EpRet EpCost --smooth 5
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np

DIV_LINE_WIDTH = 50


def smooth_series(x, smooth: int):
    """Moving-window average, same formula as the reference
    (plot.py:16-28)."""
    if smooth <= 1:
        return np.asarray(x, dtype=float)
    y = np.ones(smooth)
    x = np.asarray(x, dtype=float)
    z = np.ones(len(x))
    return np.convolve(x, y, 'same') / np.convolve(z, y, 'same')


def get_datasets(logdir, condition=None, smooth=1, value_keys=()):
    """Recursively collect progress.txt files under logdir into DataFrames
    (reference get_datasets, plot.py:67-145). Condition defaults to the
    exp_name from config.json."""
    import pandas as pd

    datasets = []
    unit = 0
    for root, _, files in os.walk(logdir):
        if 'progress.txt' not in files:
            continue
        exp_name = None
        try:
            with open(osp.join(root, 'config.json')) as f:
                exp_name = json.load(f).get('exp_name')
        except Exception:
            pass
        cond = condition or exp_name or 'exp'
        try:
            data = pd.read_table(osp.join(root, 'progress.txt'))
        except Exception:
            continue
        if data.empty:
            continue
        data.insert(len(data.columns), 'Unit', unit)
        data.insert(len(data.columns), 'Condition1', cond)
        for v in value_keys:
            if v in data.columns and smooth > 1:
                data[v] = smooth_series(data[v], smooth)
        datasets.append(data)
        unit += 1
    return datasets


def plot_data(data, xaxis='TotalEnvInteracts', value='EpRet',
              condition='Condition1', ax=None):
    """Seaborn lineplot with sd band (reference plot_data, plot.py:15-66)."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    if isinstance(data, list):
        data = pd.concat(data, ignore_index=True)
    sns.set(style='darkgrid', font_scale=1.2, palette='colorblind')
    sns.lineplot(data=data, x=xaxis, y=value, hue=condition, errorbar='sd',
                 ax=ax)
    target = ax if ax is not None else plt.gca()
    loc = 'lower right' if 'Ret' in value or 'Reward' in value else 'upper right'
    target.legend(loc=loc, ncol=1, handlelength=1, borderaxespad=0.,
                  prop={'size': 8})
    if np.max(np.asarray(data[xaxis])) > 5e3:
        target.ticklabel_format(style='sci', axis='x', scilimits=(0, 0))


def make_plots(logdirs, values=('EpRet',), xaxis='TotalEnvInteracts',
               smooth=1, select=None, exclude=None, out_dir='./results'):
    """One PNG per value (reference make_plots, plot.py:198-228 +
    plot_all.py's reward/cost pairing)."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    logdirs = [d for d in logdirs if not exclude
               or all(e not in d for e in exclude)]
    if select:
        logdirs = [d for d in logdirs if any(s in d for s in select)]
    data = []
    for d in logdirs:
        data += get_datasets(d, smooth=smooth, value_keys=values)
    if not data:
        raise SystemExit(f'no progress.txt found under {logdirs}')
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for value in values:
        have = [d for d in data if value in d.columns]
        if not have:
            print(f'skip {value}: not present in any run')
            continue
        plt.figure(figsize=(8, 5))
        plot_data(have, xaxis=xaxis, value=value)
        out = osp.join(out_dir, f'{value}.png')
        plt.tight_layout(pad=0.5)
        plt.savefig(out, dpi=120)
        plt.close()
        outs.append(out)
        print(f'wrote {out}')
    return outs


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument('logdir', nargs='+')
    parser.add_argument('--results_dir', default='./results/')
    parser.add_argument('--xaxis', '-x', default='TotalEnvInteracts')
    parser.add_argument('--value', '-y', default=['EpRet'], nargs='*')
    parser.add_argument('--reward', action='store_true',
                        help='shortcut: plot EpRet (plot_all.py mode)')
    parser.add_argument('--cost', action='store_true',
                        help='shortcut: plot EpCost + CostRate')
    parser.add_argument('--smooth', '-s', type=int, default=1)
    parser.add_argument('--select', nargs='*')
    parser.add_argument('--exclude', nargs='*')
    args = parser.parse_args(argv)

    values = list(args.value)
    if args.reward and 'EpRet' not in values:
        values.append('EpRet')
    if args.cost:
        values += [v for v in ('EpCost', 'CostRate') if v not in values]
    make_plots(args.logdir, values=values, xaxis=args.xaxis,
               smooth=args.smooth, select=args.select, exclude=args.exclude,
               out_dir=args.results_dir)


if __name__ == '__main__':
    main()
