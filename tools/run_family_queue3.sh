#!/bin/bash
# Round-5 family queue, part 3: re-train Push + Chase after the
# delta-reward fix (prev captured pre-step), plus the TRPO Push control.
set -u
cd /root/repo
run() {
    local algo=$1 task=$2 pool=$3
    echo "=== $(date +%H:%M:%S) start $algo $task pool=$pool ==="
    timeout 5400 python -m guardx_tpu.train --algo "$algo" --task "$task" \
        --env_num 2000 --max_ep_len 200 --epochs 150 --seed 0 \
        --pool_refresh 8 --layout_pool "$pool" --model_save \
        --exp_name "${algo}_r5fix" 2>&1 | tail -3
    echo "=== $(date +%H:%M:%S) done $algo $task rc=$? ==="
}
run cpo Push_Point_8Hazards 786432
run trpo Push_Point_8Hazards 786432
run cpo Chase_Point_8Ghosts 262144
echo "QUEUE3 COMPLETE"
