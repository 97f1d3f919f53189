#!/bin/bash
# Round-5 multi-seed reference side-by-side (VERDICT r4 item #6):
# USL + SafetyLayer reference trainers at seeds 1,2 (seed 0 exists from
# r4) — 200 envs x 50 epochs, CPU torch, sequential, low priority.
set -u
cd /root/repo
for algo in usl safelayer; do
    for seed in 1 2; do
        echo "=== $(date +%H:%M:%S) start ref $algo s$seed ==="
        nice -n 19 timeout 14400 python tools/run_ref_sidebyside.py \
            "$algo" 200 50 "$seed" 2>&1 | tail -3
        echo "=== $(date +%H:%M:%S) done ref $algo s$seed rc=$? ==="
    done
done
echo "REF SBS QUEUE COMPLETE"
