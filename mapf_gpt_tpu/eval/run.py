"""Suite-evaluation CLI — the ``benchmark.py`` equivalent.

    python -m mapf_gpt_tpu.eval.run --suite /root/reference/eval_configs/01-random \
        [--weights out/ckpt | --weights path/to/MAPF-GPT-2M.pt | --random-init 2M] \
        [--algo MAPF-GPT-2M] [--mask greed_action ...] \
        [--batch-envs 128] [--out-dir results] [--argmax] [--limit N]

Loads the suite's ``maps.yaml`` + ``<suite>.yaml`` (reference format), expands
the grid search, runs batched on-device episodes, writes
``<out>/<suite>/<algo>.json`` and prints the tabular view — mirroring
ref:benchmark.py:20-50 + pogema-toolbox's evaluation/views.

``--algo KEY`` selects an entry from the suite yaml's ``algorithms`` block
(the reference's per-algorithm config, ref:mapf_gpt/inference.py:13-31):
``path_to_weights`` resolves the checkpoint (``--weights`` still overrides,
e.g. for locally trained orbax dirs), ``mask_*`` flags switch on the input
ablations, and ``parallel_backend``/``num_process`` are noted but unused —
process fan-out is replaced by on-device env batching (``--batch-envs``).
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


MASK_KEYS = ("mask_actions_history", "mask_cost2go", "mask_goal",
             "mask_greed_action")


def resolve_algorithm(suite_cfg: dict, args) -> tuple[dict, object]:
    """Pick an ``algorithms``-block entry and build the MaskConfig.

    Returns (algo_cfg, mask_cfg).  CLI ``--mask`` flags OR into the yaml's
    mask_* switches (ref:mapf_gpt/inference.py:23-26)."""
    from mapf_gpt_tpu.ops.masking import MaskConfig

    algo_cfg: dict = {}
    if args.algo:
        algos = suite_cfg.get("algorithms") or {}
        if args.algo not in algos:
            raise SystemExit(
                f"algorithm {args.algo!r} not in suite yaml "
                f"(available: {sorted(algos)})")
        algo_cfg = dict(algos[args.algo])
    cli_masks = {f"mask_{m}" for m in (args.mask or [])}
    unknown = cli_masks - set(MASK_KEYS)
    if unknown:
        raise SystemExit(f"unknown --mask flags: {sorted(unknown)}; "
                         f"choose from {[k[5:] for k in MASK_KEYS]}")
    mask_cfg = MaskConfig(**{k: bool(algo_cfg.get(k, False)) or k in cli_masks
                             for k in MASK_KEYS})
    return algo_cfg, mask_cfg


def load_policy(args, algo_cfg: dict | None = None):
    """Returns (model_cfg, params, name)."""
    algo_cfg = algo_cfg or {}
    if not args.weights and not args.random_init:
        # fall back to the algorithms block's path_to_weights
        # (ref:eval_configs/05-puzzles/05-puzzles.yaml:38)
        ptw = algo_cfg.get("path_to_weights")
        if ptw:
            cand = [ptw] + ([os.path.join(args.weights_root, ptw)]
                            if args.weights_root else [])
            found = [c for c in cand if os.path.exists(c)]
            if not found:
                raise SystemExit(
                    f"path_to_weights {ptw!r} not found (tried {cand}); "
                    "pass --weights to override (reference .pt downloads "
                    "are egress-blocked in this environment)")
            args.weights = found[0]
            if args.model is None:  # infer size from the weights name
                for size in CONFIGS:
                    if size in os.path.basename(ptw):
                        args.model = size
                        break
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
    p.add_argument("--algo", default=None,
                   help="key into the suite yaml's algorithms block")
    p.add_argument("--weights-root", default=None,
                   help="directory to resolve the yaml's path_to_weights in")
    p.add_argument("--mask", nargs="*", default=None,
                   help="input ablations: actions_history cost2go goal "
                        "greed_action (also honored from the yaml)")
    p.add_argument("--batch-envs", type=int, default=128)
    p.add_argument("--out-dir", default="results")
    p.add_argument("--argmax", action="store_true")
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of episodes (smoke runs)")
    p.add_argument("--agents", type=int, nargs="*", default=None,
                   help="restrict the grid search to these num_agents "
                        "values (e.g. ablation tables at one density; "
                        "every agent tier is its own kernel compile)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--policy-batch", type=int, default=8192,
                   help="microbatch the per-step policy forward (0 = off)")
    p.add_argument("--max-contexts", type=int, default=None,
                   help="cap env x agent contexts per device batch; "
                        "default = harness.default_max_contexts(model) — "
                        "the measured per-model device-fault envelope "
                        "(CONFORMANCE.md)")
    p.add_argument("--on-target", default=None,
                   choices=["nothing", "restart"],
                   help="override the suite's on_target (pogema's lifelong "
                        "protocol uses 'restart', ref:create_env.py:28); "
                        "results land under <suite>-lifelong/")
    p.add_argument("--queued-goals", type=int, default=16,
                   help="lifelong goal-queue depth K with "
                        "--on-target restart (see EpisodeSpec)")
    p.add_argument("--max-seeds", type=int, default=None,
                   help="restrict the grid search to seeds < N")
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
    if args.agents:
        specs = [s for s in specs if s.num_agents in set(args.agents)]
    if args.max_seeds is not None:
        specs = [s for s in specs if s.seed < args.max_seeds]
    if args.on_target:
        import dataclasses

        specs = [dataclasses.replace(
            s, on_target=args.on_target,
            num_queued_goals=(args.queued_goals
                              if args.on_target == "restart" else 1))
            for s in specs]
        if args.on_target == "restart":
            suite_name += "-lifelong"
    if args.limit:
        specs = specs[: args.limit]
    algo_cfg, mask_cfg = resolve_algorithm(suite_cfg, args)
    model_cfg, params, algo_name = load_policy(args, algo_cfg)
    if args.algo:
        algo_name = args.algo
    if mask_cfg.any:
        algo_name += "-" + "-".join(
            k[5:] for k in MASK_KEYS if getattr(mask_cfg, k))
    print(f"suite {suite_name}: {len(specs)} episodes, algo {algo_name}"
          + (f" masks={[k for k in MASK_KEYS if getattr(mask_cfg, k)]}"
             if mask_cfg.any else ""))

    ev = Evaluator(reg, model_cfg, params, batch_envs=args.batch_envs,
                   do_sample=not args.argmax, sample_seed=args.seed,
                   policy_batch=args.policy_batch or None,
                   max_contexts=args.max_contexts,
                   mask_cfg=mask_cfg if mask_cfg.any else None)
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
