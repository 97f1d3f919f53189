"""Multi-experiment launcher.

Rebuild of the reference's GPU-greedy scheduler
(reference: safe_rl_libX/run.py:7-123: poll nvidia-smi free VRAM, launch
each job as a subprocess on the best GPU, refuse below 3.2 GB). On a TPU
host the accelerator is not time-shareable the same way, so the scheduler
runs a bounded pool of subprocesses — default one at a time per local
TPU process (XLA owns the whole chip), more with --parallel for CPU jobs —
and streams each job's output to its own log file.

Jobs are shell command strings, one per line in a jobs file, or built from
the --algos/--tasks grid:

    python -m guardx_tpu.run --algos cpo trpolag --tasks \
        Goal_Point_8Hazards Goal_Ant_8Hazards -- --env_num 1200 --epochs 100
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
import time


def build_grid_jobs(algos, tasks, extra_args):
    """One train command per (algo, task) — the commented launcher grid in
    the reference (run.py:80-105)."""
    jobs = []
    for algo in algos:
        for task in tasks:
            cmd = [sys.executable, '-m', 'guardx_tpu.train',
                   '--algo', algo, '--task', task] + list(extra_args)
            jobs.append(' '.join(shlex.quote(c) for c in cmd))
    return jobs


def run_jobs(jobs, parallel: int = 1, log_dir: str = './run_logs',
             poll_s: float = 2.0):
    """Run all jobs with at most `parallel` concurrent subprocesses.
    Returns the list of (job, returncode)."""
    os.makedirs(log_dir, exist_ok=True)
    pending = list(enumerate(jobs))
    running = []  # (idx, job, Popen, logfile)
    results = [None] * len(jobs)

    while pending or running:
        while pending and len(running) < parallel:
            idx, job = pending.pop(0)
            log_path = os.path.join(log_dir, f'job{idx:03d}.log')
            logf = open(log_path, 'w')
            logf.write(job + '\n\n')
            logf.flush()
            print(f'[run] start job {idx}: {job}')
            proc = subprocess.Popen(job, shell=True, stdout=logf,
                                    stderr=subprocess.STDOUT)
            running.append((idx, job, proc, logf))
        still = []
        for idx, job, proc, logf in running:
            rc = proc.poll()
            if rc is None:
                still.append((idx, job, proc, logf))
            else:
                logf.close()
                results[idx] = (job, rc)
                status = 'ok' if rc == 0 else f'FAILED rc={rc}'
                print(f'[run] job {idx} {status}')
        running = still
        if running:
            time.sleep(poll_s)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--jobs_file', type=str, default=None,
                        help='file with one shell command per line')
    parser.add_argument('--algos', nargs='*', default=[])
    parser.add_argument('--tasks', nargs='*', default=[])
    parser.add_argument('--parallel', type=int, default=1)
    parser.add_argument('--log_dir', type=str, default='./run_logs')
    parser.add_argument('extra', nargs=argparse.REMAINDER,
                        help='args after -- are passed to every train job')
    args = parser.parse_args(argv)

    extra = args.extra[1:] if args.extra[:1] == ['--'] else args.extra
    jobs = []
    if args.jobs_file:
        with open(args.jobs_file) as f:
            jobs += [ln.strip() for ln in f if ln.strip()
                     and not ln.startswith('#')]
    if args.algos and args.tasks:
        jobs += build_grid_jobs(args.algos, args.tasks, extra)
    if not jobs:
        raise SystemExit('no jobs: pass --jobs_file or --algos + --tasks')
    results = run_jobs(jobs, parallel=args.parallel, log_dir=args.log_dir)
    failed = [r for r in results if r[1] != 0]
    print(f'[run] done: {len(results) - len(failed)}/{len(results)} ok')
    return 1 if failed else 0


if __name__ == '__main__':
    sys.exit(main())
