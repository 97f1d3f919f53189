#!/bin/bash
# Round-5 main TPU queue: FrankaCubeStack PPO (VERDICT r4 #5), then the
# HumanoidAMP walking run at reference-scale optimization (VERDICT r4 #3)
# with the r5 PD-scale + raw-obs-rms fixes and T=300 horizon.
set -u
cd /root/repo
echo "=== $(date +%H:%M:%S) start franka ==="
timeout 3600 python -m guardx_tpu.train --algo ppo --task FrankaCubeStack \
    --env_num 1024 --max_ep_len 150 --epochs 400 --seed 0 \
    --obs_norm --hid 256 --model_save --exp_name franka_r5 2>&1 | tail -3
echo "=== $(date +%H:%M:%S) done franka rc=$? ==="
echo "=== $(date +%H:%M:%S) start humanoid_amp walk ==="
timeout 11400 python -m guardx_tpu.train --algo amp --task HumanoidAMP \
    --env_num 2048 --max_ep_len 300 --epochs 3000 --seed 0 \
    --obs_norm --hid 512 --target_kl 0.05 --log_std_init -2.9 \
    --amp_motions walk,run --model_save --save_freq 100 \
    --exp_name hamp_walk_r5 2>&1 | tail -3
echo "=== $(date +%H:%M:%S) done humanoid_amp rc=$? ==="
echo "MAIN QUEUE COMPLETE"
