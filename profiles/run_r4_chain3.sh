#!/bin/bash
# Round-4 chip pipeline, part 3: strictly serial (the 6M-eval worker crash
# co-occurred with concurrent prewarm program loads — one TPU client at a
# time from here on).
set -u
EVAL2M_PID=${1:?pid of the running 2M eval}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

while [ -d "/proc/${EVAL2M_PID}" ]; do sleep 15; done
echo "=== 2M eval done $(date -u +%H:%M:%S) ===" >> logs/chain_r4.log

# 6M eval remainder (03 rerun after the worker crash, 04, 05)
timeout 3600 python -u -m mapf_gpt_tpu.eval.benchmark \
  --suites 03-warehouse 04-movingai 05-puzzles \
  --weights out/r4_6m --model 6M --out-dir results_r4 \
  > logs/eval_r4_6m_b.log 2>&1
echo "=== 6M eval remainder done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# ablation matrix: four masks on 01-random at A=32
for m in actions_history cost2go goal greed_action; do
  timeout 1200 python -u -m mapf_gpt_tpu.eval.run \
    --suite /root/reference/eval_configs/01-random \
    --weights out/r3_2m --model 2M --mask $m --agents 32 \
    --out-dir results_r4_ablation >> logs/eval_r4_ablation.log 2>&1
  echo "=== mask $m done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
done

# gate 4: stitched real-tile Berlin_1_256
timeout 1800 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --out-dir results_r4 > logs/bigmap_r4_85m.log 2>&1
echo "=== bigmap 85M done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
timeout 1800 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 2M --weights out/r3_2m --out-dir results_r4 \
  > logs/bigmap_r4_2m.log 2>&1
echo "=== bigmap 2M done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# warehouse argmax A/B at two densities picked for 1-compile-per-tier
timeout 1800 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --weights out/r3_2m --model 2M --argmax --agents 96 192 \
  --out-dir results_r4_argmax > logs/eval_r4_argmax.log 2>&1
echo "=== argmax A/B done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# lifelong 128-env warehouse K=16 (previously OOM'd at reset compile)
timeout 1500 python -u profile_lifelong_mem.py 128 > logs/lifelong_r4.log 2>&1
echo "=== lifelong 128 done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# context-envelope probe (solo this time)
timeout 2400 python -u profile_envelope.py > logs/envelope_r4.log 2>&1
echo "=== envelope done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

echo "CHAIN3_DONE $(date -u +%H:%M:%S)" >> logs/chain_r4.log
