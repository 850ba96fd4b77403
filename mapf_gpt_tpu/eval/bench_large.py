"""BASELINE gate 4: 85M batched rollout on 256x256 MovingAI-class maps.

The reference's 04-movingai suite tiles city maps to 64x64
(ref:eval_configs/04-movingai/maps.yaml), but BASELINE gate 4 asks for the
85M policy on a full 256x256 map (Berlin_1_256 class).  Real MovingAI maps
cannot be downloaded here (no egress), so the default map is the procedural
:func:`mapf_gpt_tpu.maps.city_grid`; pass ``--map <file.map>`` to run a real
one.  Reports reset time (the dense [A, H, W] cost2go build), steady-state
env-steps/s, and device HBM in use.

Usage:
    python -m mapf_gpt_tpu.eval.bench_large [--model 85M] [--envs 8]
        [--agents 256] [--steps 32] [--weights out/...] [--map berlin.map]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="85M")
    p.add_argument("--envs", type=int, default=8)
    p.add_argument("--agents", type=int, default=256)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--weights", default=None)
    p.add_argument("--map", default=None, help="MovingAI .map file")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--policy-batch", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.maps import city_grid, parse_movingai_map, sample_instance
    from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
    from mapf_gpt_tpu.parallel.rollout import batch_reset, make_batch_rollout

    if args.map:
        with open(args.map) as f:
            grid0 = parse_movingai_map(f.read())
    else:
        grid0 = city_grid(args.size, seed=args.seed)
    insts = [sample_instance(grid0, args.agents, seed=args.seed + i,
                             map_name=args.map or f"city-{args.size}")
             for i in range(args.envs)]
    h, w = insts[0].grid.shape
    b, a = args.envs, args.agents
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=a,
                            max_episode_steps=args.steps)
    grids = jnp.asarray(np.stack([i.grid for i in insts]))
    starts = jnp.asarray(np.stack([i.starts for i in insts]))
    goals = jnp.asarray(np.stack([i.goals for i in insts]))[:, :, None, :]
    actives = jnp.ones((b, a), dtype=bool)

    cfg = CONFIGS[args.model]
    if args.weights:
        from mapf_gpt_tpu.train.train_step import (TrainConfig,
                                                   init_train_state)
        from mapf_gpt_tpu.utils import checkpoint as ckpt

        template = init_train_state(
            init_params(cfg, jax.random.PRNGKey(0)), TrainConfig())
        state, _ = ckpt.restore_checkpoint(args.weights, template)
        params = state.params
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    # reset: builds b * a dense [H, W] cost2go fields on device
    t0 = time.perf_counter()
    states = batch_reset(spec, grids, starts, goals, actives)
    sync(states.c2g[:, :1, :1])
    reset_s = time.perf_counter() - t0
    c2g_mb = b * a * h * w * 4 / 2 ** 20

    run = make_batch_rollout(spec, cfg, do_sample=True,
                             policy_batch=args.policy_batch)
    final, metrics = run(params, states, jax.random.PRNGKey(1))
    sync(metrics)
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        final, metrics = run(params, states, jax.random.PRNGKey(2 + i))
        sync(metrics)
        best = min(best, time.perf_counter() - t0)

    hbm = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        hbm = {"hbm_in_use_gb": round(stats["bytes_in_use"] / 2 ** 30, 2),
               "hbm_limit_gb": round(stats["bytes_limit"] / 2 ** 30, 2)}
    except Exception:
        pass

    out = {
        "model": args.model, "map": args.map or f"city-{args.size}",
        "grid": [h, w], "envs": b, "agents": a, "steps": args.steps,
        "reset_s": round(reset_s, 2), "c2g_mb": round(c2g_mb, 1),
        "env_steps_per_s": round(b * args.steps / best, 1),
        "agent_steps_per_s": round(b * a * args.steps / best, 1),
        "isr": round(float(np.mean(np.asarray(metrics.isr))), 4),
        **hbm,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
