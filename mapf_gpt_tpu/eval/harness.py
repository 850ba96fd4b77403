"""Benchmark harness: suite configs -> batched on-device episodes -> metrics.

The reference delegates this to pogema-toolbox (`evaluation(config, dir)`,
ref:benchmark.py:20-50): YAML `grid_search` expansion over map / agent count /
seed, dask process fan-out, metric aggregation, tabular + plot views.  Here
the fan-out is a batch dimension: episodes are grouped by static shape
(padded map tier, agent-slot tier), vmapped under jit, and optionally sharded
over the mesh `data` axis — the policy runs once per step for every agent of
every episode in the group.

Suite YAML schema matches the reference's eval configs
(ref:eval_configs/01-random/01-random.yaml): an `environment` block whose
scalar values may be replaced by `{grid_search: [...]}`, an `algorithms`
block, and `results_views`.
"""

from __future__ import annotations

import itertools
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from mapf_gpt_tpu.maps import MapRegistry, pad_grid, sample_instance

METRIC_KEYS = ("CSR", "ISR", "SoC", "makespan", "ep_length", "runtime",
               "avg_agents_density", "avg_throughput")


@dataclass(frozen=True)
class EpisodeSpec:
    map_name: str
    num_agents: int
    seed: int
    max_episode_steps: int = 128
    on_target: str = "nothing"
    # lifelong goal-queue depth; pogema issues unlimited goals, here a
    # static queue (K) approximates it — agents that exhaust the queue
    # hold their last goal and stop counting toward throughput
    num_queued_goals: int = 1


def expand_grid_search(env_cfg: dict) -> list[EpisodeSpec]:
    """Expand `{key: {grid_search: [...]}}` into the cartesian product
    (the pogema-toolbox semantics)."""
    keys, choices = [], []
    scalars: dict[str, Any] = {}
    for k, v in env_cfg.items():
        if isinstance(v, dict) and "grid_search" in v:
            keys.append(k)
            choices.append(v["grid_search"])
        else:
            scalars[k] = v
    specs = []
    for combo in itertools.product(*choices) if keys else [()]:
        cfg = dict(scalars)
        cfg.update(dict(zip(keys, combo)))
        on_target = str(cfg.get("on_target", "nothing"))
        k = int(cfg.get("num_queued_goals",
                        16 if on_target == "restart" else 1))
        specs.append(EpisodeSpec(
            map_name=str(cfg.get("map_name", "")),
            num_agents=int(cfg.get("num_agents", 1)),
            seed=int(cfg.get("seed", 0)),
            max_episode_steps=int(cfg.get("max_episode_steps", 128)),
            on_target=on_target,
            num_queued_goals=k,
        ))
    return specs


def _tier(n: int, step: int = 32) -> int:
    return -(-n // step) * step


@dataclass
class EvalResult:
    rows: list[dict] = field(default_factory=list)

    def save_json(self, path: str, algorithm: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump([{"algorithm": algorithm, **r} for r in self.rows],
                      f, indent=1)


# Per-device-batch cap on env x agent contexts per step.  History: rounds
# 2-3 reproducibly crashed the tunneled v5e worker above ~16k contexts
# (warehouse A=160 x 128 envs) and the CLIs carried a magic 12288.  Round 4
# replaced the tokenizer's scalar-gather window extraction (the prime
# suspect) with MXU selector matmuls and re-probed (profile_envelope.py):
# 2M now runs 24576 contexts (128 envs x 192 agents) clean — the old fault
# was the gather — while 6M still faults at 12288 (clean at 8192) and 85M
# faulted at 2048 contexts on a 288^2-grid rollout: the residual fault
# tracks the megakernel's size, so the default cap is model-tiered.
# Measured data in CONFORMANCE.md; any value remains overridable.
DEFAULT_MAX_CONTEXTS = 12288  # model-agnostic fallback


def default_max_contexts(model_cfg) -> int:
    """Measured per-model device-fault envelope (v5e, round 4)."""
    if model_cfg is None:         # model-less harness tests
        return DEFAULT_MAX_CONTEXTS
    if model_cfg.n_embd <= 192:   # 2M: probed clean through 24576
        return 24576
    if model_cfg.n_embd <= 384:   # 6M: faults at 12288, clean at 8192
        return 8192
    return 2048                   # 85M: conservative (faulted on big grids)


class Evaluator:
    """Runs episode specs against a policy with shape-tier batching."""

    def __init__(self, registry: MapRegistry, model_cfg, params,
                 batch_envs: int = 128, do_sample: bool = True,
                 sample_seed: int = 0, mesh=None,
                 policy_batch: int | None = 8192,
                 max_contexts: int | None = None,
                 mask_cfg=None, lazy_lifelong: bool = True):
        if max_contexts is None:
            max_contexts = default_max_contexts(model_cfg)
        self.registry = registry
        self.model_cfg = model_cfg
        self.params = params
        self.batch_envs = batch_envs
        self.do_sample = do_sample
        self.sample_seed = sample_seed
        self.mesh = mesh
        # chunk the per-step policy forward (the reference's batch_size=2048
        # chunking, ref:inference.py:30,87-101) so huge env x agent products
        # stay within VMEM; max_contexts bounds the total batch.
        self.policy_batch = policy_batch
        self.max_contexts = max_contexts
        # input-ablation switches (the reference's mask_* inference options,
        # ref:mapf_gpt/inference.py:23-26), applied inside the rollout
        self.mask_cfg = mask_cfg
        # lifelong episodes hold [A,1,H,W] current-goal cost2go and
        # recompute on queue-advance (lazy == dense bit-for-bit,
        # tests/test_env.py::test_lazy_lifelong_c2g_matches_dense); K-fold
        # smaller state lifts the lifelong envs/chip cap ~16x
        self.lazy_lifelong = lazy_lifelong
        self._runners: dict = {}
        self._compiled: dict = {}

    # -- internal ---------------------------------------------------------
    def _group_key(self, spec: EpisodeSpec):
        grid = self.registry[spec.map_name]
        h, w = pad_grid(grid).shape
        return (_tier(h), _tier(w), _tier(spec.num_agents, 8),
                spec.max_episode_steps, spec.on_target,
                spec.num_queued_goals)

    def _build_instance(self, spec: EpisodeSpec, hw: tuple[int, int],
                        slots: int):
        """Returns (grid, starts [slots,2], goals_queue [slots,K,2], active).
        K>1 queues come from sample_instance's lifelong goal sampling."""
        kq = spec.num_queued_goals
        inst = sample_instance(self.registry[spec.map_name], spec.num_agents,
                               spec.seed, map_name=spec.map_name,
                               num_lifelong_goals=kq if kq > 1 else 0,
                               masks=self.registry.masks(spec.map_name))
        h, w = inst.grid.shape
        th, tw = hw
        grid = np.pad(inst.grid, ((0, th - h), (0, tw - w)),
                      constant_values=True)
        starts = np.zeros((slots, 2), dtype=np.int32)
        goals = np.zeros((slots, kq, 2), dtype=np.int32)
        a = inst.num_agents
        starts[:a] = inst.starts
        goals[:a] = (inst.lifelong_goals if kq > 1
                     else inst.goals[:, None, :])
        if slots > a:  # park padding slots on free cells, goal=start
            free = np.argwhere(~grid)
            used = {tuple(x) for x in inst.starts}
            extras = [c for c in map(tuple, free) if c not in used]
            if not extras:
                # dense layouts (5x5 puzzles at the 8-slot tier) can host an
                # agent on every free cell; inactive slots are invisible to
                # dynamics and observations (envs/dynamics.py drops them from
                # collision scatters), so reusing occupied cells is safe
                extras = [tuple(inst.starts[0])]
            for k in range(slots - a):
                starts[a + k] = extras[k % len(extras)]
                goals[a + k] = extras[k % len(extras)]
        active = np.zeros((slots,), dtype=bool)
        active[:a] = True
        return grid, starts, goals, active

    def _runner(self, spec_key, slots):
        from mapf_gpt_tpu.envs.env import MapfEnvSpec
        from mapf_gpt_tpu.parallel.rollout import make_batch_rollout

        th, tw, _, max_steps, on_target, kq = spec_key
        if spec_key not in self._runners:
            lazy = on_target == "restart" and self.lazy_lifelong
            # dense lifelong batches build A*K cost2go fields at reset;
            # chunk the relaxation sweep so its intermediates stay bounded
            # at any batch size (the 128-env warehouse K=16 reset OOM'd
            # unchunked; see MapfEnvSpec.c2g_chunk).  Lazy mode computes A
            # fields at reset and needs no chunking.
            chunk = (max(kq, 8192 // max(1, self.batch_envs))
                     if kq > 1 and not lazy else 0)
            env_spec = MapfEnvSpec(height=th, width=tw, num_agents=slots,
                                   max_episode_steps=max_steps,
                                   on_target=on_target,
                                   num_queued_goals=kq,
                                   c2g_chunk=chunk,
                                   lazy_c2g=lazy)
            run = make_batch_rollout(env_spec, self.model_cfg,
                                     do_sample=self.do_sample,
                                     policy_batch=self.policy_batch,
                                     mask_cfg=self.mask_cfg)
            self._runners[spec_key] = (env_spec, run)
        return self._runners[spec_key]

    def _compiled_run(self, spec_key, run, params, states, key_rng):
        """AOT-compile the episode runner per batch shape so compile time
        never pollutes the per-episode ``runtime`` metric (pogema's
        RuntimeMetricWrapper times execution only)."""
        shape_key = (spec_key, states.pos.shape[0])
        if shape_key not in self._compiled:
            self._compiled[shape_key] = run.lower(
                params, states, key_rng).compile()
        return self._compiled[shape_key]

    # -- public -----------------------------------------------------------
    def run(self, specs: list[EpisodeSpec], progress=lambda *_: None,
            on_chunk=None) -> EvalResult:
        import jax
        import jax.numpy as jnp

        from mapf_gpt_tpu.parallel.rollout import batch_reset

        result = EvalResult()
        groups: dict = {}
        for spec in specs:
            groups.setdefault(self._group_key(spec), []).append(spec)

        done = 0
        for key, group in groups.items():
            th, tw, slots = key[0], key[1], key[2]
            env_spec, run = self._runner(key, slots)
            # bound the total env x agent product; the per-step forward is
            # further chunked by policy_batch inside the rollout so VMEM
            # stays bounded at any contexts count
            batch_envs = max(1, min(self.batch_envs,
                                    self.max_contexts // slots))
            for lo in range(0, len(group), batch_envs):
                chunk = group[lo:lo + batch_envs]
                n_real = len(chunk)
                # tier the final short chunk to a multiple of 8 instead of
                # padding to the full batch (duplicate episodes re-simulate
                # for nothing; extra shape tiers just recompile once each)
                bt = min(batch_envs, _tier(n_real, 8))
                padded = chunk + [chunk[-1]] * (bt - n_real) \
                    if n_real < bt else chunk
                built = [self._build_instance(s, (th, tw), slots)
                         for s in padded]
                grids = jnp.asarray(np.stack([b[0] for b in built]))
                starts = jnp.asarray(np.stack([b[1] for b in built]))
                goals = jnp.asarray(np.stack([b[2] for b in built]))
                actives = jnp.asarray(np.stack([b[3] for b in built]))
                states = batch_reset(env_spec, grids, starts, goals, actives)
                key_rng = jax.random.fold_in(
                    jax.random.PRNGKey(self.sample_seed), done)
                compiled = self._compiled_run(key, run, self.params,
                                              states, key_rng)
                t0 = time.perf_counter()
                final, metrics = compiled(self.params, states, key_rng)
                # host fetch doubles as the sync barrier (block_until_ready
                # returns before execution on remote-tunneled platforms)
                m = {k: np.asarray(v) for k, v in metrics._asdict().items()}
                # per-episode runtime = the batch's execution wall time split
                # evenly over its episodes: batch-synchronous scan runs every
                # episode for max_episode_steps, so the marginal cost per
                # episode is uniform (unlike pogema's per-process timing,
                # compile time is excluded via the AOT compile above)
                runtime = (time.perf_counter() - t0) / bt
                for i, spec in enumerate(chunk):
                    result.rows.append({
                        "map_name": spec.map_name,
                        "num_agents": spec.num_agents,
                        "seed": spec.seed,
                        "CSR": float(m["csr"][i]),
                        "ISR": float(m["isr"][i]),
                        "SoC": float(m["soc"][i]),
                        "makespan": float(m["makespan"][i]),
                        "ep_length": float(m["ep_length"][i]),
                        "runtime": runtime,
                        "avg_agents_density": float(m["agents_density"][i]),
                        "avg_throughput": float(m["throughput"][i]),
                    })
                done += n_real
                progress(done, len(specs))
                if on_chunk is not None:
                    on_chunk(result)
        return result


# -- views ---------------------------------------------------------------

def tabular_view(rows: list[dict], drop_keys: list[str],
                 group_keys: tuple = ("map_name", "num_agents", "seed")
                 ) -> str:
    """Aggregate + format like pogema-toolbox's TabularView."""
    keep = [k for k in group_keys if k not in drop_keys]
    metrics = [m for m in METRIC_KEYS
               if m not in drop_keys and (not rows or m in rows[0])]
    buckets: dict = {}
    for r in rows:
        k = tuple(r[g] for g in keep)
        buckets.setdefault(k, []).append(r)
    header = keep + metrics
    lines = ["  ".join(f"{h:>12}" for h in header)]
    for k in sorted(buckets):
        vals = buckets[k]
        cells = [f"{v:>12}" for v in k]
        for mname in metrics:
            cells.append(f"{np.mean([v[mname] for v in vals]):>12.4f}")
        lines.append("  ".join(cells))
    return "\n".join(lines)


def plot_view(rows: list[dict], x: str, y: str, out_path: str,
              ticks=None, **style) -> str | None:
    """Matplotlib plot spec equivalent (optional dependency)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    xs = sorted({r[x] for r in rows})
    ys = [np.mean([r[y] for r in rows if r[x] == v]) for v in xs]
    fig, ax = plt.subplots(figsize=(style.get("width", 3.0),
                                    style.get("height", 2.5)))
    ax.plot(xs, ys, lw=style.get("line_width", 2))
    if style.get("use_log_scale_x"):
        ax.set_xscale("log")
        ax.set_xticks(ticks or xs)
        ax.get_xaxis().set_major_formatter(
            __import__("matplotlib.ticker", fromlist=["ScalarFormatter"])
            .ScalarFormatter())
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
