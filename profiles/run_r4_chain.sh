#!/bin/bash
# Round-4 chip pipeline: wait for the 2M resume (pid $1) -> train 6M ->
# eval both models over all five suites -> ablations -> argmax A/B ->
# bigmap gate 4 -> lifelong 128-env -> context-envelope probe.
# One TPU process at a time throughout.
set -u
TRAIN2M_PID=${1:?pid of the running 2M trainer}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

while [ -d "/proc/${TRAIN2M_PID}" ]; do sleep 20; done
echo "=== 2M training done $(date -u +%H:%M:%S) ===" >> logs/chain_r4.log

# 6M: complete 9k-iter cosine schedule (time-budgeted; documented in README)
timeout 7500 python -u -m mapf_gpt_tpu.train.loop --model 6M \
  --train-data dataset/train_r3 --valid-data dataset/validation \
  --out-dir out/r4_6m --grad-accum 1 --max-iters 9000 \
  > logs/train_r4_6m.log 2>&1
echo "=== 6M training done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# full five-suite benchmark, both models
timeout 3000 python -u -m mapf_gpt_tpu.eval.benchmark \
  --weights out/r4_6m --model 6M --out-dir results_r4 \
  > logs/eval_r4_6m.log 2>&1
echo "=== 6M eval done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

timeout 3000 python -u -m mapf_gpt_tpu.eval.benchmark \
  --weights out/r3_2m --model 2M --out-dir results_r4 \
  > logs/eval_r4_2m.log 2>&1
echo "=== 2M eval done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# ablation matrix: the four reference masks on 01-random, full protocol
for m in actions_history cost2go goal greed_action; do
  timeout 1500 python -u -m mapf_gpt_tpu.eval.run \
    --suite /root/reference/eval_configs/01-random \
    --weights out/r3_2m --model 2M --mask $m --out-dir results_r4_ablation \
    >> logs/eval_r4_ablation.log 2>&1
  echo "=== mask $m done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
done

# warehouse argmax A/B (sampling-noise discriminator for the density collapse)
timeout 1800 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --weights out/r3_2m --model 2M --argmax --out-dir results_r4_argmax \
  > logs/eval_r4_argmax.log 2>&1
echo "=== argmax A/B done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# gate 4: stitched real-tile Berlin_1_256 with 85M (perf) and trained 2M (quality)
timeout 1800 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --out-dir results_r4 \
  > logs/bigmap_r4_85m.log 2>&1
echo "=== bigmap 85M done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
timeout 1800 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 2M --weights out/r3_2m --out-dir results_r4 \
  > logs/bigmap_r4_2m.log 2>&1
echo "=== bigmap 2M done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# lifelong 128-env warehouse K=16 (previously OOM'd at reset compile)
timeout 1800 python -u profile_lifelong_mem.py 128 > logs/lifelong_r4.log 2>&1
echo "=== lifelong 128 done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# context-envelope probe
timeout 3000 python -u profile_envelope.py > logs/envelope_r4.log 2>&1
echo "=== envelope done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

echo "CHAIN_DONE $(date -u +%H:%M:%S)" >> logs/chain_r4.log
