"""Suite-evaluation CLI — the ``benchmark.py`` equivalent.

    python -m mapf_gpt_tpu.eval.run --suite /root/reference/eval_configs/01-random \
        [--weights out/ckpt | --weights path/to/MAPF-GPT-2M.pt | --random-init 2M] \
        [--batch-envs 128] [--out-dir results] [--argmax] [--limit N]

Loads the suite's ``maps.yaml`` + ``<suite>.yaml`` (reference format), expands
the grid search, runs batched on-device episodes, writes
``<out>/<suite>/<algo>.json`` and prints the tabular view — mirroring
ref:benchmark.py:20-50 + pogema-toolbox's evaluation/views.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np
import yaml

from mapf_gpt_tpu.eval.harness import (
    Evaluator, expand_grid_search, plot_view, tabular_view)
from mapf_gpt_tpu.maps import MapRegistry
from mapf_gpt_tpu.models.gpt import CONFIGS, init_params


def load_policy(args):
    """Returns (model_cfg, params, name)."""
    if args.random_init:
        cfg = CONFIGS[args.random_init]
        params = init_params(cfg, __import__("jax").random.PRNGKey(0))
        return cfg, params, f"MAPF-GPT-{args.random_init}-random"
    if args.weights and args.weights.endswith(".pt"):
        from mapf_gpt_tpu.models.convert import load_torch_checkpoint

        cfg, params = load_torch_checkpoint(args.weights)
        return cfg, params, os.path.basename(args.weights)[:-3]
    if args.weights:  # orbax checkpoint dir written by the trainer
        from mapf_gpt_tpu.train.train_step import TrainConfig, init_train_state
        from mapf_gpt_tpu.utils import checkpoint as ckpt

        meta_model = args.model or "2M"
        cfg = CONFIGS[meta_model]
        import jax

        template = init_train_state(
            init_params(cfg, jax.random.PRNGKey(0)), TrainConfig())
        state, meta = ckpt.restore_checkpoint(args.weights, template)
        return cfg, state.params, f"MAPF-GPT-{meta_model}-ckpt"
    raise SystemExit("provide --weights or --random-init")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--suite", required=True,
                   help="suite dir containing maps.yaml and <suite>.yaml")
    p.add_argument("--weights", default=None)
    p.add_argument("--model", default=None, choices=[None, *CONFIGS])
    p.add_argument("--random-init", default=None, choices=list(CONFIGS))
    p.add_argument("--batch-envs", type=int, default=128)
    p.add_argument("--out-dir", default="results")
    p.add_argument("--argmax", action="store_true")
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of episodes (smoke runs)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--policy-batch", type=int, default=8192,
                   help="microbatch the per-step policy forward (0 = off)")
    p.add_argument("--max-contexts", type=int, default=32768,
                   help="cap env x agent contexts per device batch")
    args = p.parse_args(argv)

    suite_name = os.path.basename(os.path.normpath(args.suite))
    reg = MapRegistry()
    reg.load_yaml(os.path.join(args.suite, "maps.yaml"))
    cfg_files = [f for f in glob.glob(os.path.join(args.suite, "*.yaml"))
                 if not f.endswith("maps.yaml")]
    assert cfg_files, f"no suite yaml in {args.suite}"
    with open(cfg_files[0]) as f:
        suite_cfg = yaml.safe_load(f)

    specs = expand_grid_search(suite_cfg["environment"])
    if args.limit:
        specs = specs[: args.limit]
    model_cfg, params, algo_name = load_policy(args)
    print(f"suite {suite_name}: {len(specs)} episodes, algo {algo_name}")

    ev = Evaluator(reg, model_cfg, params, batch_envs=args.batch_envs,
                   do_sample=not args.argmax, sample_seed=args.seed,
                   policy_batch=args.policy_batch or None,
                   max_contexts=args.max_contexts)
    out_json = os.path.join(args.out_dir, suite_name, f"{algo_name}.json")
    result = ev.run(specs,
                    progress=lambda d, t: print(f"  {d}/{t} episodes",
                                                flush=True),
                    # persist incrementally so long runs survive interruption
                    on_chunk=lambda r: r.save_json(out_json, algo_name))
    result.save_json(out_json, algo_name)
    print(f"wrote {out_json}")

    views = suite_cfg.get("results_views", {})
    for name, view in views.items():
        if view.get("type") == "tabular":
            print(f"== {name} ==")
            print(tabular_view(result.rows, view.get("drop_keys", [])))
        elif view.get("type") == "plot":
            path = os.path.join(args.out_dir, suite_name, f"{name}.png")
            made = plot_view(result.rows, view["x"], view["y"], path,
                             ticks=view.get("ticks"),
                             width=view.get("width", 3.0),
                             height=view.get("height", 2.5),
                             line_width=view.get("line_width", 2),
                             use_log_scale_x=view.get("use_log_scale_x"))
            if made:
                print(f"wrote {made}")
    summary = {m: float(np.mean([r[m] for r in result.rows]))
               for m in ("CSR", "ISR", "SoC", "makespan", "ep_length")}
    print(json.dumps({"suite": suite_name, "algo": algo_name,
                      "episodes": len(result.rows), **summary}))


if __name__ == "__main__":
    main()
