#!/bin/bash
# Round-5 session 2, stage 2: the exact rl_games optimization regime,
# constructible for the first time now that minibatched PPO exists.
# 1) HumanoidAMP with the full HumanoidAMPPPO.yaml recipe: 4096 envs,
#    horizon 16 (continuous), minibatch 32768, mini_epochs 6, lr 5e-5,
#    gamma 0.99, lam(tau) 0.95, disc replay + input norm + value
#    bootstrap, lr_schedule=constant (NO KL early stop — rl_games takes
#    all 12 minibatch steps) — every diverging ingredient mirrored at once.
# 2) FrankaCubeStack under FrankaCubeStackPPO.yaml's regime.
# Waits for PID $1 (the hamp_replay_r5c run) to release the TPU.
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
cd /root/repo
echo "=== $(date +%H:%M:%S) start hamp rlgames-regime ==="
timeout 4500 python -m guardx_tpu.train --algo amp --task HumanoidAMP \
    --env_num 4096 --max_ep_len 300 --epochs 20000 --seed 0 \
    --obs_norm --hid 1024 --target_kl 0.05 --log_std_init -2.9 \
    --continuous --rollout_horizon 16 --amp_motions walk,run \
    --model_save --save_freq 1000 \
    --algo_hp disc_reward_w=2.0,task_reward_w=0.0,pi_lr=5e-5,vf_lr=2.5e-4,lam=0.95,minibatch_size=32768,mini_epochs=6,disc_iters=12,train_v_iters=8,train_vc_iters=2,amp_replay_size=1000000,amp_replay_store=1024,lr_schedule=constant \
    --exp_name hamp_rlg_r5 2>&1 | tail -3
echo "=== $(date +%H:%M:%S) done hamp rc=$? ==="
echo "=== $(date +%H:%M:%S) start franka minibatched ==="
timeout 5400 python -m guardx_tpu.train --algo ppo --task FrankaCubeStack \
    --env_num 2048 --max_ep_len 150 --epochs 6000 --seed 0 \
    --obs_norm --hid 256 --target_kl 0.05 --continuous --rollout_horizon 32 \
    --model_save --save_freq 1000 \
    --algo_hp pi_lr=5e-4,vf_lr=5e-4,minibatch_size=16384,mini_epochs=5,train_v_iters=8,train_vc_iters=2,lr_schedule=adaptive,kl_threshold=0.008 \
    --exp_name franka_mb_r5 2>&1 | tail -3
echo "=== $(date +%H:%M:%S) done franka rc=$? ==="
