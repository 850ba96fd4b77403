#!/bin/bash
# Round-5 chip pipeline, part 3 (post-restart recovery): the sandbox
# restart wiped out/, logs/, .jax_cache/ and dataset/train_r3 after the
# 6M 30k run was exported+committed (checkpoints/MAPF-GPT-6M-r5.pt).
# This chain redoes the lost evals from the committed torch exports and
# trains the first 85M on the regenerating dataset (dataset/train_r5,
# 2 background workers): 6M 01/02/03/04 (05 already done) -> 2M lifelong
# warehouse -> 85M 1500-iter train -> export -> 85M 01-random {32,64}
# -> 85M Berlin gate.  One TPU process at a time.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
LOG=logs/chain_r5c.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }
W=checkpoints/MAPF-GPT-6M-r5.pt

for s in 01-random 02-mazes; do
  timeout 1500 python -u -m mapf_gpt_tpu.eval.run \
    --suite /root/reference/eval_configs/$s \
    --weights $W --model 6M --out-dir results_r5 \
    > logs/eval_r5_6m_$s.log 2>&1
  mark "6M $s rc=$?"
done

timeout 1800 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --weights $W --model 6M --out-dir results_r5 \
  --max-contexts 4096 > logs/eval_r5_6m_03-warehouse.log 2>&1
mark "6M 03-warehouse rc=$?"

timeout 1800 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/04-movingai \
  --weights $W --model 6M --out-dir results_r5 \
  --max-contexts 2048 > logs/eval_r5_6m_04-movingai.log 2>&1
mark "6M 04-movingai rc=$?"

timeout 900 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --on-target restart --queued-goals 16 --max-seeds 8 \
  --weights checkpoints/MAPF-GPT-2M-r4.pt --model 2M --out-dir results_r5 \
  > logs/eval_r5_lifelong.log 2>&1
mark "2M lifelong warehouse rc=$?"

timeout 1500 python -u -m mapf_gpt_tpu.train.loop --model 85M \
  --train-data dataset/train_r5 --valid-data dataset/validation \
  --out-dir out/r5_85m --grad-accum 1 --max-iters 1500 \
  > logs/train_r5_85m.log 2>&1
mark "85M training rc=$?"

env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python profiles/export_ckpt.py \
  --model 85M --ckpt out/r5_85m --out checkpoints/MAPF-GPT-85M-r5.pt \
  --log logs/train_r5_85m.log --curve checkpoints/curve-85M-r5.json \
  --note "round 5, first trained 85M: 1500-iter cosine, single v5e chip (batch 512, grad-accum 1); data = regenerating dataset/train_r5 after the mid-round sandbox restart wiped dataset/train_r3" \
  >> "$LOG" 2>&1
mark "85M export rc=$?"

timeout 1200 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/01-random \
  --agents 32 64 \
  --weights out/r5_85m --model 85M --out-dir results_r5 \
  > logs/eval_r5_85m.log 2>&1
mark "85M 01-random rc=$?"

timeout 1200 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --weights out/r5_85m --envs 4 --agents 256 --steps 128 \
  --out-dir results_r5 > logs/bigmap_r5_85m.log 2>&1
mark "85M Berlin gate rc=$?"
mark "CHAIN3 COMPLETE"
