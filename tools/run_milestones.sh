#!/bin/bash
# Sequential milestone learning runs on the TPU chip (BASELINE.md milestone
# configs #1-#3). Run from a repo snapshot so later source edits don't
# change the traced programs mid-pipeline:
#   rsync -a --exclude .git /root/repo/ /tmp/gx_snap/
#   nohup bash /tmp/gx_snap/tools/run_milestones.sh > /tmp/milestones.log 2>&1 &
# Each distinct (algo, env_num, numerics) tuple costs one long XLA compile
# over the axon tunnel (~30 min); repeats hit the persistent compile cache.
set -ux
cd "$(dirname "$0")/.."
LOGS=/root/repo/logs
mkdir -p "$LOGS"

run() {
  echo "=== $* $(date)"
  timeout 7200 python -u -m guardx_tpu.train --task Goal_Point_8Hazards \
    --max_ep_len 200 --data_dir "$LOGS" --model_save --save_freq 50 "$@"
}

# milestone #3: CPO + TRPO-Lag, env_num=4000 (reference suite scale,
# run.py:80-90), 150 epochs, 2 seeds
run --algo cpo     --env_num 4000 --epochs 150 --seed 0
run --algo cpo     --env_num 4000 --epochs 150 --seed 1
run --algo trpolag --env_num 4000 --epochs 150 --seed 0
run --algo trpolag --env_num 4000 --epochs 150 --seed 1

# milestone #2: TRPO env_num=2000
run --algo trpo --env_num 2000 --epochs 100 --seed 0

# numerics A/B (VERDICT r1 weak #3): CPO with reference-exact numerics
# (full-batch FVP curvature, fp32 critic compute)
GUARDX_FVP_SAMPLES=0 GUARDX_CRITIC_COMPUTE=f32 \
  run --algo cpo --env_num 4000 --epochs 150 --seed 0 --exp_name cpo_exact

# milestone #1: PPO env_num=16 on CPU
GUARDX_PLATFORM=cpu GUARDX_NO_COMPILE_CACHE=1 \
  run --algo ppo --env_num 16 --epochs 50 --seed 0

echo "=== milestones done $(date)"
