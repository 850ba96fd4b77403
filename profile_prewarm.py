"""Pre-warm the persistent compile cache for an eval run's tier shapes.

Each Evaluator tier is a distinct jit program whose Mosaic megakernel costs
~3 min of remote compile on the tunneled chip; compiles are host-side on
the worker, so running them from a second process OVERLAPS them with the
chip-bound eval that is currently executing.  Mirrors Evaluator._group_key /
batching exactly (harness.py) and lowers run(params, states, key) on
abstract shapes — a cache-key match means the real eval later compiles in
seconds.  Usage: python profile_prewarm.py <model> <weights_dir|-> [suites...]
"""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np
import jax
import jax.numpy as jnp

from mapf_gpt_tpu.envs import env as menv
from mapf_gpt_tpu.eval.harness import (DEFAULT_MAX_CONTEXTS, _tier,
                                       expand_grid_search)
from mapf_gpt_tpu.maps import MapRegistry, pad_grid
from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
from mapf_gpt_tpu.parallel.rollout import make_batch_rollout

SUITES_ROOT = "/root/reference/eval_configs"


def tier_shapes(suite_dir, batch_envs=128, max_contexts=DEFAULT_MAX_CONTEXTS):
    import glob
    import yaml

    reg = MapRegistry()
    reg.load_yaml(os.path.join(suite_dir, "maps.yaml"))
    cfgf = [f for f in glob.glob(os.path.join(suite_dir, "*.yaml"))
            if not f.endswith("maps.yaml")][0]
    with open(cfgf) as f:
        suite_cfg = yaml.safe_load(f)
    specs = expand_grid_search(suite_cfg["environment"])
    groups = {}
    for s in specs:
        h, w = pad_grid(reg[s.map_name]).shape
        key = (_tier(h), _tier(w), _tier(s.num_agents, 8),
               s.max_episode_steps, s.on_target, s.num_queued_goals)
        groups.setdefault(key, []).append(s)
    shapes = []
    for key, group in groups.items():
        slots = key[2]
        be = max(1, min(batch_envs, max_contexts // slots))
        n = len(group)
        for lo in range(0, n, be):
            bt = min(be, _tier(n - lo, 8))
            shapes.append((key, bt))
    return sorted(set(shapes), key=lambda x: -x[1])


def prewarm(model, shapes):
    cfg = CONFIGS[model]
    params_sds = jax.eval_shape(partial(init_params, cfg),
                                jax.random.PRNGKey(0))
    done = set()
    for (th, tw, slots, steps, on_target, kq), bt in shapes:
        if ((th, tw, slots, steps, on_target, kq), bt) in done:
            continue
        chunk = (max(kq, 8192 // 128) if kq > 1 else 0)
        env_spec = menv.MapfEnvSpec(height=th, width=tw, num_agents=slots,
                                    max_episode_steps=steps,
                                    on_target=on_target,
                                    num_queued_goals=kq, c2g_chunk=chunk)
        run = make_batch_rollout(env_spec, cfg, do_sample=True,
                                 policy_batch=8192, mask_cfg=None)
        g = jax.ShapeDtypeStruct((bt, th, tw), jnp.bool_)
        st = jax.ShapeDtypeStruct((bt, slots, 2), jnp.int32)
        gl = jax.ShapeDtypeStruct((bt, slots, kq, 2), jnp.int32)
        ac = jax.ShapeDtypeStruct((bt, slots), jnp.bool_)
        states = jax.eval_shape(jax.vmap(partial(menv.reset, env_spec)),
                                g, st, gl, ac)
        key_sds = jax.eval_shape(lambda: jax.random.fold_in(
            jax.random.PRNGKey(0), 0))
        t0 = time.time()
        try:
            run.lower(params_sds, states, key_sds).compile()
            print(f"warm {model} tier={(th, tw, slots, steps)} B={bt}: "
                  f"{time.time() - t0:.0f}s", flush=True)
        except Exception as e:
            print(f"FAILED {model} tier={(th, tw, slots, steps)} B={bt}: "
                  f"{type(e).__name__} {e}", flush=True)
        done.add(((th, tw, slots, steps, on_target, kq), bt))


if __name__ == "__main__":
    model = sys.argv[1]
    suites = sys.argv[3:] or ["01-random", "02-mazes", "03-warehouse",
                              "04-movingai", "05-puzzles"]
    shapes = []
    for s in suites:
        shapes += tier_shapes(os.path.join(SUITES_ROOT, s))
    shapes = sorted(set(shapes), key=lambda x: (-x[1], x[0]))
    print(f"{len(shapes)} tier shapes to warm for {model}", flush=True)
    prewarm(model, shapes)
    print("PREWARM_DONE", flush=True)
