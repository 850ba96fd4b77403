"""256x256-map batched rollout benchmark (BASELINE gate 4).

The reference evaluates 04-movingai on 64x64 tiles of MovingAI city maps; the
full 256x256 maps (e.g. Berlin_1_256) are the scale its hierarchical lattice
cost2go exists for (ref:mapf_gpt/observation_generator.cpp:43-132).  Our
design replaces the hierarchy with dense per-goal cost2go fields — [A, K, H,
W] int32 in EnvState — which at A=256 on a padded 266^2 grid is ~72 MB per
env, so this tier needs an explicit proof: reset sweeps, shape tiers and
policy microbatching all at once.

    python -m mapf_gpt_tpu.eval.bigmap --map Berlin_1_256 --model 85M \
        [--weights out/ckpt] [--envs 8] [--agents 256] [--steps 256]

Reassembles the full map from the reference suite's tiles
(maps.MapRegistry.stitch_tiles), runs batched episodes through the standard
Evaluator, and prints env-steps/s plus device-memory stats; writes the eval
rows as a results artifact.  When the map is not in the suite (or the suite
is absent), ``--map city-256 --procedural`` runs the procedural
:func:`mapf_gpt_tpu.maps.city_grid` stand-in; a real MovingAI ``.map`` file
path also works (this absorbs the former eval/bench_large.py).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from mapf_gpt_tpu.eval.harness import EpisodeSpec, Evaluator
from mapf_gpt_tpu.maps import MapRegistry
from mapf_gpt_tpu.models.gpt import CONFIGS, init_params

REF_SUITE = "/root/reference/eval_configs/04-movingai"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default=REF_SUITE)
    p.add_argument("--map", default="Berlin_1_256")
    p.add_argument("--model", default="85M", choices=list(CONFIGS))
    p.add_argument("--weights", default=None)
    p.add_argument("--envs", type=int, default=8)
    p.add_argument("--agents", type=int, default=256)
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--policy-batch", type=int, default=8192)
    p.add_argument("--out-dir", default="results")
    p.add_argument("--argmax", action="store_true")
    p.add_argument("--procedural", action="store_true",
                   help="use the procedural city_grid stand-in (size parsed "
                        "from a 'city-<N>' --map name, default 256)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    reg = MapRegistry()
    if args.procedural:
        from mapf_gpt_tpu.maps import city_grid

        size = int(args.map.rsplit("-", 1)[1]) if "-" in args.map else 256
        grid = city_grid(size, seed=args.seed)
        reg.register(args.map, grid)
    elif os.path.isfile(args.map):  # a real MovingAI .map file
        from mapf_gpt_tpu.maps import parse_movingai_map

        with open(args.map) as f:
            grid = parse_movingai_map(f.read())
        args.map = os.path.splitext(os.path.basename(args.map))[0]
        reg.register(args.map, grid)
    else:
        reg.load_reference_suite(args.suite)
        grid = reg.stitch_tiles(args.map)   # registers under args.map
    print(f"{args.map}: {grid.shape[0]}x{grid.shape[1]}, "
          f"obstacle density {grid.mean():.3f}")

    cfg = CONFIGS[args.model]
    if args.weights:
        from mapf_gpt_tpu.eval.run import load_policy

        ns = argparse.Namespace(weights=args.weights, model=args.model,
                                random_init=None, weights_root=None)
        cfg, params, _ = load_policy(ns)
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))

    specs = [EpisodeSpec(args.map, args.agents, s, max_episode_steps=args.steps)
             for s in range(args.envs)]
    ev = Evaluator(reg, cfg, params, batch_envs=args.envs,
                   do_sample=not args.argmax,
                   policy_batch=args.policy_batch,
                   max_contexts=args.envs * args.agents)
    result = ev.run(specs, progress=lambda d, t: print(f"  {d}/{t} episodes",
                                                       flush=True))

    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    hbm_peak = stats.get("peak_bytes_in_use", 0)
    hbm_limit = stats.get("bytes_limit", 0)
    runtime = float(np.mean([r["runtime"] for r in result.rows]))
    env_steps_per_s = args.steps / runtime if runtime > 0 else float("nan")
    agent_steps_per_s = env_steps_per_s * args.agents

    os.makedirs(os.path.join(args.out_dir, "bigmap"), exist_ok=True)
    out_json = os.path.join(args.out_dir, "bigmap",
                            f"{args.map}-{args.model}.json")
    result.save_json(out_json, f"MAPF-GPT-{args.model}-{args.map}")
    summary = {
        "map": args.map, "model": args.model, "envs": args.envs,
        "agents": args.agents, "steps": args.steps,
        "env_steps_per_s": round(env_steps_per_s, 1),
        "agent_steps_per_s": round(agent_steps_per_s, 1),
        "runtime_per_episode_s": round(runtime, 3),
        "hbm_peak_gb": round(hbm_peak / 2 ** 30, 2),
        "hbm_limit_gb": round(hbm_limit / 2 ** 30, 2),
        "mean_ISR": float(np.mean([r["ISR"] for r in result.rows])),
        "artifact": out_json,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
