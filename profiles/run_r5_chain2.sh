#!/bin/bash
# Round-5 chip pipeline, part 2: takes over from run_r5_chain.sh after the
# 6M 04-movingai device fault (crashed at the default 8192-context cap on
# 96^2-padded tiles — the big-grid signature again).  Waits for the
# orphaned 03-warehouse eval (pid $1), retries 04 at a 2048 cap, then the
# trimmed remainder: 85M 2.5k -> export -> 85M 01-random {32,64} ->
# lifelong warehouse -> Berlin gate (128 steps) -> 6M fault bisect.
set -u
EVAL03_PID=${1:?pid of the running 03-warehouse eval}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
LOG=logs/chain_r5.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }

while [ -d "/proc/${EVAL03_PID}" ]; do sleep 10; done
mark "6M 03-warehouse (orphaned) finished"

timeout 2400 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/04-movingai \
  --weights out/r5_6m --model 6M --out-dir results_r5 \
  --max-contexts 2048 > logs/eval_r5_6m_04-movingai_b.log 2>&1
mark "6M 04-movingai retry rc=$?"

timeout 2400 python -u -m mapf_gpt_tpu.train.loop --model 85M \
  --train-data dataset/train_r3 --valid-data dataset/validation \
  --out-dir out/r5_85m --grad-accum 1 --max-iters 2500 \
  > logs/train_r5_85m.log 2>&1
mark "85M training rc=$?"

env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python profiles/export_ckpt.py \
  --model 85M --ckpt out/r5_85m --out checkpoints/MAPF-GPT-85M-r5.pt \
  --log logs/train_r5_85m.log --curve checkpoints/curve-85M-r5.json \
  --note "round 5, first trained 85M: 2.5k-iter cosine, single v5e chip (batch 512, grad-accum 1)" \
  >> "$LOG" 2>&1
mark "85M export rc=$?"

timeout 2100 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/01-random \
  --agents 32 64 \
  --weights out/r5_85m --model 85M --out-dir results_r5 \
  > logs/eval_r5_85m.log 2>&1
mark "85M 01-random rc=$?"

timeout 2100 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --on-target restart --queued-goals 16 --max-seeds 8 \
  --weights out/r3_2m --model 2M --out-dir results_r5 \
  > logs/eval_r5_lifelong.log 2>&1
mark "2M lifelong warehouse rc=$?"

timeout 1500 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --weights out/r5_85m --envs 4 --agents 256 --steps 128 \
  --out-dir results_r5 > logs/bigmap_r5_85m.log 2>&1
mark "85M Berlin gate rc=$?"

timeout 1500 python -u profiles/profile_fault_bisect.py --model 6M \
  --envs 64 --agents 192 --probes rollout policy obsenv \
  --out results_r5/fault_bisect_6M.json > logs/bisect_6m.log 2>&1
mark "6M fault bisect rc=$?"
mark "CHAIN2 COMPLETE"
