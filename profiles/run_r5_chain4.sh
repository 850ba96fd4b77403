#!/bin/bash
# Round-5 chip pipeline, part 4 (time-boxed takeover of chain3): with the
# post-restart compile cache cold, each suite costs ~18 min, so the
# chain3 order would have spent the whole round on 6M evals and never
# trained the 85M.  Revised order after the orphaned 01-random eval
# (pid $1) finishes: 6M 02-mazes -> 6M 03-warehouse (the two dense
# suites that carry the model-family-ordering claim) -> first trained
# 85M (1000-iter cosine on the regenerating dataset) -> export -> 85M
# 01-random @32 -> 85M Berlin gate -> 6M 04-movingai (if time remains
# before the driver's cutoff, it is last).  One TPU process at a time.
set -u
EVAL01_PID=${1:?pid of the running 01-random eval}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
LOG=logs/chain_r5c.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }
W=checkpoints/MAPF-GPT-6M-r5.pt

while [ -d "/proc/${EVAL01_PID}" ]; do sleep 5; done
mark "6M 01-random (orphaned) finished"

timeout 1500 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/02-mazes \
  --weights $W --model 6M --out-dir results_r5 \
  > logs/eval_r5_6m_02-mazes.log 2>&1
mark "6M 02-mazes rc=$?"

# 64 of the reference's 128 seeds per tier: halves the wall-clock of the
# slowest suite so the 85M train fits before the driver cutoff (labeled
# in the README table).
timeout 1200 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --weights $W --model 6M --out-dir results_r5 --max-seeds 64 \
  --max-contexts 4096 > logs/eval_r5_6m_03-warehouse.log 2>&1
mark "6M 03-warehouse rc=$?"

timeout 1100 python -u -m mapf_gpt_tpu.train.loop --model 85M \
  --train-data dataset/train_r5 --valid-data dataset/validation \
  --out-dir out/r5_85m --grad-accum 1 --max-iters 1000 \
  --eval-interval 250 \
  > logs/train_r5_85m.log 2>&1
mark "85M training rc=$?"

env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python profiles/export_ckpt.py \
  --model 85M --ckpt out/r5_85m --out checkpoints/MAPF-GPT-85M-r5.pt \
  --log logs/train_r5_85m.log --curve checkpoints/curve-85M-r5.json \
  --note "round 5, first trained 85M: 1000-iter cosine, single v5e chip (batch 512, grad-accum 1); data = regenerating dataset/train_r5 after the mid-round sandbox restart wiped dataset/train_r3" \
  >> "$LOG" 2>&1
mark "85M export rc=$?"

timeout 900 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/01-random \
  --agents 32 \
  --weights out/r5_85m --model 85M --out-dir results_r5 \
  > logs/eval_r5_85m.log 2>&1
mark "85M 01-random rc=$?"

timeout 900 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --weights out/r5_85m --envs 4 --agents 256 --steps 128 \
  --out-dir results_r5 > logs/bigmap_r5_85m.log 2>&1
mark "85M Berlin gate rc=$?"

timeout 1800 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/04-movingai \
  --weights $W --model 6M --out-dir results_r5 \
  --max-contexts 2048 > logs/eval_r5_6m_04-movingai.log 2>&1
mark "6M 04-movingai rc=$?"
mark "CHAIN4 COMPLETE"
