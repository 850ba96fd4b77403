#!/bin/bash
# Round-5 chip pipeline (v2): wait for the 6M 30k run (pid $1) -> export ->
# 6M five-suite benchmark (one PROCESS per suite: round 4's single-process
# run lost 04/05 when the 6M device fault killed the worker mid-03) ->
# 6M fault bisect (lite) -> lifelong warehouse (2M, lazy c2g) ->
# first trained 85M -> 85M 01-random -> Berlin bisect (lite) + gate ->
# full bisects if time allows -> final bench.
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

# 6M five-suite benchmark, process-isolated per suite and uniformly at a
# conservative 4096-context cap; warehouse last (round 4: the 6M device
# fault killed a single-process run mid-03 even at 8192 contexts, losing
# 04/05 — the faulting shape is not fully characterized, so play safe)
for s in 01-random 02-mazes 04-movingai 05-puzzles 03-warehouse; do
  timeout 2400 python -u -m mapf_gpt_tpu.eval.run \
    --suite /root/reference/eval_configs/$s \
    --weights out/r5_6m --model 6M --out-dir results_r5 \
    --max-contexts 4096 > logs/eval_r5_6m_$s.log 2>&1
  mark "6M $s rc=$?"
done

timeout 1500 python -u profiles/profile_fault_bisect.py --model 6M \
  --envs 64 --agents 192 --probes rollout policy obsenv \
  --out results_r5/fault_bisect_6M.json > logs/bisect_6m.log 2>&1
mark "6M fault bisect lite rc=$?"

timeout 2400 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --on-target restart --queued-goals 16 --max-seeds 16 \
  --weights out/r3_2m --model 2M --out-dir results_r5 \
  > logs/eval_r5_lifelong.log 2>&1
mark "2M lifelong warehouse rc=$?"

timeout 5400 python -u -m mapf_gpt_tpu.train.loop --model 85M \
  --train-data dataset/train_r3 --valid-data dataset/validation \
  --out-dir out/r5_85m --grad-accum 1 --max-iters 4000 \
  > logs/train_r5_85m.log 2>&1
mark "85M training rc=$?"

env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python profiles/export_ckpt.py \
  --model 85M --ckpt out/r5_85m --out checkpoints/MAPF-GPT-85M-r5.pt \
  --log logs/train_r5_85m.log --curve checkpoints/curve-85M-r5.json \
  --note "round 5, first trained 85M: 4k-iter cosine, single v5e chip (batch 512, grad-accum 1)" \
  >> "$LOG" 2>&1
mark "85M export rc=$?"

timeout 3000 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/01-random \
  --weights out/r5_85m --model 85M --out-dir results_r5 \
  > logs/eval_r5_85m.log 2>&1
mark "85M 01-random rc=$?"

timeout 1500 python -u profiles/profile_fault_bisect.py --model 85M \
  --envs 8 --agents 256 --bigmap --probes rollout policy obsenv \
  --out results_r5/fault_bisect_85M.json > logs/bisect_85m.log 2>&1
mark "85M bigmap bisect lite rc=$?"

timeout 2000 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --weights out/r5_85m --envs 8 --agents 256 --steps 256 \
  --out-dir results_r5 > logs/bigmap_r5_85m.log 2>&1
mark "85M Berlin gate rc=$?"

timeout 1200 python -u bench.py > logs/bench_r5.log 2>&1
mark "bench rc=$?"

# bonus diagnostics if the round still has time
timeout 1800 python -u profiles/profile_fault_bisect.py --model 6M \
  --envs 64 --agents 192 --probes nochunk flax ctx2 lpc1 \
  --out results_r5/fault_bisect_6M_stage2.json > logs/bisect_6m_s2.log 2>&1
mark "6M fault bisect stage2 rc=$?"
mark "CHAIN COMPLETE"
