#!/bin/bash
# Round-4 chip pipeline, part 4: redo the 6M dense suites below its
# measured fault envelope.  The v5e worker crash reproduces (twice, once
# solo) at 6M x 12288 contexts (warehouse A=96 x 128 envs) while 2M runs
# the same tier clean and 6M runs 8192-context tiers clean -> the envelope
# scales with model size; run 6M at --max-contexts 8192.
set -u
CHAIN3_PID=${1:?pid of the running chain3 bash}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

while [ -d "/proc/${CHAIN3_PID}" ]; do sleep 15; done
echo "=== chain3 finished, starting 6M redo $(date -u +%H:%M:%S) ===" >> logs/chain_r4.log

timeout 4800 python -u -m mapf_gpt_tpu.eval.benchmark \
  --suites 03-warehouse 04-movingai 05-puzzles \
  --weights out/r4_6m --model 6M --out-dir results_r4 \
  --max-contexts 8192 > logs/eval_r4_6m_c.log 2>&1
echo "=== 6M dense-suite redo done $(date -u +%H:%M:%S) rc=$? ===" >> logs/chain_r4.log
echo "CHAIN4_DONE $(date -u +%H:%M:%S)" >> logs/chain_r4.log
