#!/bin/bash
# Round-5 family queue, part 2: Push/Defense need very large layout
# pools — rejection acceptance is ~0.7% / ~0.3% under their keepout
# constraints (the reference's own sampler draws 1e6 candidate layouts
# for the same reason, engine.py:261-264).
set -u
cd /root/repo
run() {
    local algo=$1 task=$2 pool=$3
    echo "=== $(date +%H:%M:%S) start $algo $task pool=$pool ==="
    timeout 5400 python -m guardx_tpu.train --algo "$algo" --task "$task" \
        --env_num 2000 --max_ep_len 200 --epochs 150 --seed 0 \
        --pool_refresh 8 --layout_pool "$pool" --model_save 2>&1 | tail -4
    echo "=== $(date +%H:%M:%S) done $algo $task rc=$? ==="
}
run cpo Push_Point_8Hazards 786432
run trpo Push_Point_8Hazards 786432
run cpo Defense_Point_8Ghosts 2097152
echo "QUEUE2 COMPLETE"
