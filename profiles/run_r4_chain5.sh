#!/bin/bash
# Round-4 chip pipeline, part 5: lifelong bound search, 85M bigmap retry,
# final bench confirmation.  Strictly serial.
set -u
CHAIN4_PID=${1:?pid of the running chain4 bash}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

while [ -d "/proc/${CHAIN4_PID}" ]; do sleep 15; done
echo "=== chain4 finished $(date -u +%H:%M:%S) ===" >> logs/chain_r4.log

# lifelong warehouse K=16: find the per-chip envelope between 32 and 128
timeout 1200 python -u profile_lifelong_mem.py 64 > logs/lifelong_r4_64.log 2>&1
echo "=== lifelong 64 done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
timeout 1200 python -u profile_lifelong_mem.py 96 > logs/lifelong_r4_96.log 2>&1
echo "=== lifelong 96 done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# 85M bigmap retry under its measured envelope (4 envs = 1024 contexts)
timeout 1800 python -u -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 \
  --model 85M --envs 4 --policy-batch 1024 --out-dir results_r4 \
  > logs/bigmap_r4_85m_b.log 2>&1
echo "=== bigmap 85M retry done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log

# final headline bench with the round's final kernels
timeout 1200 python -u bench.py > logs/bench_r4_final.log 2>&1
echo "=== final bench done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
echo "CHAIN5_DONE $(date -u +%H:%M:%S)" >> logs/chain_r4.log
