#!/bin/bash
# Round-3 training-evidence runs, sequential on the single TPU chip.
# 1) LSTM vs FF on ShadowHand (same budget)  2) AllegroKukaLSTM curve
# 3) uncovered algo families (VERDICT r2 item 7)
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) $*"; timeout 3300 "$@"; echo "=== rc=$?"; }
run python -m guardx_tpu.train --algo ppo --task ShadowHandOpenAI_LSTM --env_num 256 --max_ep_len 128 --epochs 100 --seed 0
run python -m guardx_tpu.train --algo ppo --task ShadowHandOpenAI_FF  --env_num 256 --max_ep_len 128 --epochs 100 --seed 0
run python -m guardx_tpu.train --algo ppo --task AllegroKukaLSTM --env_num 256 --max_ep_len 200 --epochs 60 --seed 0
run python -m guardx_tpu.train --algo usl --task Goal_Point_8Hazards --env_num 4000 --max_ep_len 200 --epochs 200 --seed 0 --pool_refresh 8
run python -m guardx_tpu.train --algo pdo --task Goal_Point_8Hazards --env_num 4000 --max_ep_len 200 --epochs 200 --seed 0 --pool_refresh 8
run python -m guardx_tpu.train --algo trpofac --task Goal_Point_8Hazards --env_num 4000 --max_ep_len 200 --epochs 200 --seed 0 --pool_refresh 8
run python -m guardx_tpu.train --algo espo --task Goal_Point_8Hazards --env_num 4000 --max_ep_len 200 --epochs 200 --seed 0 --pool_refresh 8
run python -m guardx_tpu.train --algo issa --task Goal_Point_8Hazards --env_num 1200 --max_ep_len 200 --epochs 100 --seed 0 --pool_refresh 8
echo "ALL DONE $(date +%H:%M:%S)"
