#!/bin/bash
# Round-5 session 2: FrankaCubeStack under the rl_games optimization
# regime (FrankaCubeStackPPO.yaml: horizon 32, minibatch 16384,
# mini_epochs 5, lr 5e-4) via the new minibatched-PPO path + continuous
# rollouts + per-step truncation value bootstrap. Waits for the AMP
# replay run (PID $1) to release the TPU.
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
cd /root/repo
echo "=== $(date +%H:%M:%S) start franka minibatched ==="
timeout 5400 python -m guardx_tpu.train --algo ppo --task FrankaCubeStack \
    --env_num 2048 --max_ep_len 150 --epochs 6000 --seed 0 \
    --obs_norm --hid 256 --target_kl 0.05 --continuous --rollout_horizon 32 \
    --model_save --save_freq 1000 \
    --algo_hp pi_lr=5e-4,vf_lr=5e-4,minibatch_size=16384,mini_epochs=5,train_v_iters=8,train_vc_iters=2 \
    --exp_name franka_mb_r5 2>&1 | tail -3
echo "=== $(date +%H:%M:%S) done franka rc=$? ==="
