#!/bin/bash
# Round-4 chip pipeline, part 2 (replaces the tail of run_r4_chain.sh with a
# compile-budget-aware sequence; every eval tier costs a ~3 min Mosaic
# compile, so ablations/argmax run at selected densities only).
set -u
EVAL6M_PID=${1:?pid of the running 6M eval}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

while [ -d "/proc/${EVAL6M_PID}" ]; do sleep 15; done
echo "=== 6M eval done $(date -u +%H:%M:%S) ===" >> logs/chain_r4.log

timeout 5400 python -u -m mapf_gpt_tpu.eval.benchmark \
  --weights out/r3_2m --model 2M --out-dir results_r4 \
  > logs/eval_r4_2m.log 2>&1
echo "=== 2M eval done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# gate 4: stitched real-tile Berlin_1_256 (85M perf row + trained-2M quality row)
timeout 1800 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --out-dir results_r4 > logs/bigmap_r4_85m.log 2>&1
echo "=== bigmap 85M done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
timeout 1800 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 2M --weights out/r3_2m --out-dir results_r4 \
  > logs/bigmap_r4_2m.log 2>&1
echo "=== bigmap 2M done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# ablation matrix: four masks on 01-random at the headline density (A=32,
# 128 maps = 128 episodes per mask)
for m in actions_history cost2go goal greed_action; do
  timeout 1200 python -u -m mapf_gpt_tpu.eval.run \
    --suite /root/reference/eval_configs/01-random \
    --weights out/r3_2m --model 2M --mask $m --agents 32 \
    --out-dir results_r4_ablation >> logs/eval_r4_ablation.log 2>&1
  echo "=== mask $m done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
done

# warehouse argmax A/B at the collapse densities
timeout 2400 python -u -m mapf_gpt_tpu.eval.run \
  --suite /root/reference/eval_configs/03-warehouse \
  --weights out/r3_2m --model 2M --argmax --agents 96 128 160 192 \
  --out-dir results_r4_argmax > logs/eval_r4_argmax.log 2>&1
echo "=== argmax A/B done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# lifelong 128-env warehouse K=16 (previously OOM'd at reset compile)
timeout 1800 python -u profile_lifelong_mem.py 128 > logs/lifelong_r4.log 2>&1
echo "=== lifelong 128 done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# context-envelope probe
timeout 2400 python -u profile_envelope.py > logs/envelope_r4.log 2>&1
echo "=== envelope done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

echo "CHAIN2_DONE $(date -u +%H:%M:%S)" >> logs/chain_r4.log
