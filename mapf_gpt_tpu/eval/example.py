"""Single-episode CLI with SVG animation — the ``example.py`` equivalent.

    python -m mapf_gpt_tpu.eval.example --map validation-random-seed-000 \
        --suite /root/reference/eval_configs/01-random \
        [--weights ... | --random-init 2M] --num-agents 32 --seed 0 \
        --svg out/episode.svg

Mirrors ref:example.py:14-72: build env from a named map, run one episode,
print metrics, save the animation.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from mapf_gpt_tpu.maps import MapRegistry, sample_instance
from mapf_gpt_tpu.models.gpt import CONFIGS


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="/root/reference/eval_configs/01-random")
    p.add_argument("--map", dest="map_name",
                   default="validation-random-seed-000")
    p.add_argument("--num-agents", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-episode-steps", type=int, default=128)
    p.add_argument("--weights", default=None)
    p.add_argument("--model", default=None, choices=[None, *CONFIGS])
    # default None so --weights wins; load_policy prefers random_init when
    # set (a "2M" default here silently discarded --weights)
    p.add_argument("--random-init", default=None, choices=list(CONFIGS))
    p.add_argument("--argmax", action="store_true")
    p.add_argument("--svg", default="out/episode.svg")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.eval.animation import save_episode_svg
    from mapf_gpt_tpu.eval.run import load_policy
    from mapf_gpt_tpu.parallel.rollout import make_recorded_rollout

    reg = MapRegistry()
    reg.load_reference_suite(args.suite)
    inst = sample_instance(reg[args.map_name], args.num_agents, args.seed,
                           map_name=args.map_name)
    cfg, params, name = load_policy(args)

    h, w = inst.grid.shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=args.num_agents,
                            max_episode_steps=args.max_episode_steps)
    state = jax.jit(menv.reset, static_argnums=0)(
        spec, jnp.asarray(inst.grid), jnp.asarray(inst.starts),
        jnp.asarray(inst.goals)[:, None, :],
        jnp.ones((args.num_agents,), bool))
    run = make_recorded_rollout(spec, cfg, do_sample=not args.argmax)
    final, metrics, positions = run(params, state,
                                    jax.random.PRNGKey(args.seed))
    m = {k: float(np.asarray(v)) for k, v in metrics._asdict().items()}
    print(json.dumps({"algo": name, "map": args.map_name, **m}))
    os.makedirs(os.path.dirname(args.svg) or ".", exist_ok=True)
    save_episode_svg(args.svg, inst.grid, np.asarray(positions), inst.goals,
                     trim_border=0)
    print(f"wrote {args.svg}")


if __name__ == "__main__":
    main()
