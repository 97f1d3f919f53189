#!/bin/bash
# Round-5 articulated-robot training suite (VERDICT r4 weak #3: hopper/
# humanoid/arm3/arm6/drone constructible but never trained) — CPO at
# suite scale on every previously-untrained robot, now minutes each with
# the lane mega-kernel (ant 993k steps/s).
set -u
cd /root/repo
run() {
    local task=$1
    echo "=== $(date +%H:%M:%S) start cpo $task ==="
    timeout 3600 python -m guardx_tpu.train --algo cpo --task "$task" \
        --env_num 2000 --max_ep_len 200 --epochs 150 --seed 0 \
        --pool_refresh 8 --model_save --exp_name cpo_r5suite 2>&1 | tail -3
    echo "=== $(date +%H:%M:%S) done cpo $task rc=$? ==="
}
run Goal_Walker_8Hazards
run Goal_Ant_8Hazards
run Goal_Doggo_8Hazards
run Goal_Hopper_8Hazards
run Goal_Humanoid_8Hazards
run Goal_Arm3_8Hazards
run Goal_Arm6_8Hazards
run Goal_Drone_8Hazards
echo "ROBOT SUITE COMPLETE"
