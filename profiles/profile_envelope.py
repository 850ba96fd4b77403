"""Context-envelope probe (VERDICT r3 #7): find where large rollout batches
actually fail on this tunneled v5e.

Round 2/3 reproducibly crashed the TPU worker above ~16k agent contexts per
step (warehouse 128 envs x 192 agents = 24576), and eval CLIs have carried a
magic ``--max-contexts 12288`` cap since.  Round 4 replaced the tokenizer's
scalar-gather window extraction (the prime crash suspect: 24k agents x 121
scalar-indexed gathers) with MXU selector matmuls — so re-probe the
envelope.  Runs one batch size per subprocess (a worker crash kills the
process); the parent records pass/fail per size.  Not shipped; result goes
to CONFORMANCE.md and the eval CLI default.
"""
import json
import os
import subprocess
import sys

SIZES = [(64, 192), (86, 192), (104, 192), (128, 192)]  # (envs, agents)


def probe_child(b: int, a: int) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.maps import MapRegistry, sample_instance
    from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
    from mapf_gpt_tpu.parallel.rollout import batch_reset, make_batch_rollout

    reg = MapRegistry()
    reg.load_reference_suite("/root/reference/eval_configs/03-warehouse")
    name = [n for n in reg.names() if "warehouse" in n.lower()][0]
    insts = [sample_instance(reg[name], a, seed=i, masks=reg.masks(name))
             for i in range(b)]
    h, w = insts[0].grid.shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=a,
                            max_episode_steps=16)
    states = batch_reset(
        spec, jnp.asarray(np.stack([i.grid for i in insts])),
        jnp.asarray(np.stack([i.starts for i in insts])),
        jnp.asarray(np.stack([i.goals for i in insts]))[:, :, None, :],
        jnp.ones((b, a), bool))
    cfg = CONFIGS["2M"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    run = make_batch_rollout(spec, cfg, do_sample=True, policy_batch=8192)
    _, metrics = run(params, states, jax.random.PRNGKey(1))
    for leaf in jax.tree_util.tree_leaves(metrics):
        np.asarray(leaf)
    print("CHILD_OK", flush=True)


def main() -> None:
    results = []
    for b, a in SIZES:
        r = subprocess.run([sys.executable, __file__, "--child",
                            str(b), str(a)],
                           capture_output=True, text=True, timeout=900)
        ok = "CHILD_OK" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        results.append({"envs": b, "agents": a, "contexts": b * a, "ok": ok,
                        "tail": tail if not ok else []})
        print(json.dumps(results[-1]), flush=True)
    print("ENVELOPE", json.dumps(results), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        probe_child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
