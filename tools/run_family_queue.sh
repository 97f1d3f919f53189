#!/bin/bash
# Round-5 task-family training queue (VERDICT r4 item #1): CPO on the
# Push/Chase/Defense/Ghost families at suite scale + one TRPO control.
# Runs sequentially on the single TPU chip; each run logs under ./logs/.
set -u
cd /root/repo
for spec in \
    "cpo Push_Point_8Hazards" \
    "cpo Chase_Point_8Ghosts" \
    "cpo Defense_Point_8Ghosts" \
    "cpo Goal_Point_8Ghosts" \
    "trpo Push_Point_8Hazards" \
; do
    set -- $spec
    algo=$1; task=$2
    echo "=== $(date +%H:%M:%S) start $algo $task ==="
    timeout 3600 python -m guardx_tpu.train --algo "$algo" --task "$task" \
        --env_num 2000 --max_ep_len 200 --epochs 150 --seed 0 \
        --pool_refresh 8 --model_save 2>&1 | tail -4
    echo "=== $(date +%H:%M:%S) done $algo $task rc=$? ==="
done
echo "QUEUE COMPLETE"
