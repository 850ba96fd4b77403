#!/bin/bash
# Round-5 chip pipeline (v4, time-budgeted): wait for the 6M 30k run
# (pid $1) -> export -> 6M five-suite benchmark (process-isolated per
# suite; 01/02/04/05 at the default cap to reuse the round-4 compile
# cache, 03 at 4096 because 6M crashed mid-03 at 8192 in round 4) ->
# first trained 85M (2500 iters) -> 85M 01-random (3 tiers) -> lifelong
# warehouse (2M, lazy c2g) -> Berlin gate -> 6M fault bisect -> bench.
# One TPU process at a time throughout.
set -u
TRAIN6M_PID=${1:?pid of the running 6M trainer}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
LOG=logs/chain_r5.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }

while [ -d "/proc/${TRAIN6M_PID}" ]; do sleep 20; done
mark "6M training done"

env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python profiles/export_ckpt.py \
  --model 6M --ckpt out/r5_6m --out checkpoints/MAPF-GPT-6M-r5.pt \
  --log logs/train_r5_6m.log --curve checkpoints/curve-6M-r5.json \
  --note "round 5, full 30k-iter cosine, single v5e chip (batch 2048, grad-accum 1)" \
  >> "$LOG" 2>&1
mark "6M export rc=$?"

for s in 01-random 02-mazes 04-movingai 05-puzzles; do
  timeout 2100 python -u -m mapf_gpt_tpu.eval.run \
    --suite /root/reference/eval_configs/$s \
    --weights out/r5_6m --model 6M --out-dir results_r5 \
    > logs/eval_r5_6m_$s.log 2>&1
  mark "6M $s rc=$?"
done
timeout 2400 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --weights out/r5_6m --model 6M --out-dir results_r5 \
  --max-contexts 4096 > logs/eval_r5_6m_03-warehouse.log 2>&1
mark "6M 03-warehouse rc=$?"

timeout 2700 python -u -m mapf_gpt_tpu.train.loop --model 85M \
  --train-data dataset/train_r3 --valid-data dataset/validation \
  --out-dir out/r5_85m --grad-accum 1 --max-iters 3000 \
  > logs/train_r5_85m.log 2>&1
mark "85M training rc=$?"

env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python profiles/export_ckpt.py \
  --model 85M --ckpt out/r5_85m --out checkpoints/MAPF-GPT-85M-r5.pt \
  --log logs/train_r5_85m.log --curve checkpoints/curve-85M-r5.json \
  --note "round 5, first trained 85M: 3k-iter cosine, single v5e chip (batch 512, grad-accum 1)" \
  >> "$LOG" 2>&1
mark "85M export rc=$?"

timeout 2400 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/01-random \
  --agents 8 32 64 \
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
  --model 85M --weights out/r5_85m --envs 4 --agents 256 --steps 256 \
  --out-dir results_r5 > logs/bigmap_r5_85m.log 2>&1
mark "85M Berlin gate rc=$?"

timeout 1500 python -u profiles/profile_fault_bisect.py --model 6M \
  --envs 64 --agents 192 --probes rollout policy obsenv \
  --out results_r5/fault_bisect_6M.json > logs/bisect_6m.log 2>&1
mark "6M fault bisect rc=$?"

timeout 1200 python -u bench.py > logs/bench_r5.log 2>&1
mark "bench rc=$?"
mark "CHAIN COMPLETE"
