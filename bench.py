"""Headline benchmark: env-steps/s/chip for the fused rollout at the 2M policy.

Workload: 256 parallel env instances x 32 agents on the reference's
validation-random maps (falling back to procedural random maps if the
reference eval configs are absent), 128-step episodes, stochastic action
sampling — the whole env -> tokenize -> GPT -> sample -> step loop fused
on-device (parallel/rollout.py).

Baseline: the reference pipeline has no published numbers (BASELINE.md); for
``vs_baseline`` we measure the reference's own architecture — per-step C++
observation generator + torch GPT forward — on this host's CPU (the only
reference-supported device present) over the same workload, and cache the
result in ``.bench_baseline.json``.  The baseline is an extrapolation from
8 envs x 16 steps (the full workload would take hours on CPU) and is
re-measured only when the cache file is absent — so ``vs_baseline`` ratios
are comparable *within* a round but may shift between rounds when the cache
is cleared and host load differs (r01's 623.8x vs r02's 586.7x at a higher
absolute value was exactly this re-measurement artifact, not a regression).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent XLA compile cache: first-ever run pays the ~5 min remote
# compile once; every later bench (and the driver's) reuses it
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

B = 256          # env instances
A = 32           # agents per instance
STEPS = 128
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")
REF = "/root/reference"


def build_instances():
    from mapf_gpt_tpu.maps import MapRegistry, random_grid, sample_instance

    suite = os.path.join(REF, "eval_configs", "01-random")
    insts = []
    if os.path.isdir(suite):
        reg = MapRegistry()
        reg.load_reference_suite(suite)
        # use 21x21 maps only so the batch is one static shape
        names = [n for n in reg.names() if reg[n].shape == (21, 21)]
        for s in range(B):
            insts.append(sample_instance(reg[names[s % len(names)]], A, seed=s))
    else:
        for s in range(B):
            insts.append(sample_instance(random_grid(21, 0.3, s), A, seed=s))
    return insts


def measure_tpu(insts) -> float:
    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
    from mapf_gpt_tpu.parallel.rollout import batch_reset, make_batch_rollout

    h, w = insts[0].grid.shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=A,
                            max_episode_steps=STEPS)
    grids = jnp.asarray(np.stack([i.grid for i in insts]))
    starts = jnp.asarray(np.stack([i.starts for i in insts]))
    goals = jnp.asarray(np.stack([i.goals for i in insts]))[:, :, None, :]
    actives = jnp.ones((B, A), dtype=bool)

    cfg = CONFIGS["2M"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    states = batch_reset(spec, grids, starts, goals, actives)
    # no policy chunking: the fused megakernel (ops/fused_gpt.py) tiles the
    # batch itself with no large intermediates (the reference's batch_size
    # chunking, ref:mapf_gpt/inference.py:87-101, guarded the score tensor)
    run = make_batch_rollout(spec, cfg, do_sample=True)

    def sync(tree):
        # force full completion via a host fetch: on remote-tunneled
        # platforms (axon) block_until_ready returns before execution
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    # warmup/compile
    final, metrics = run(params, states, jax.random.PRNGKey(0))
    sync(metrics)

    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        final, metrics = run(params, states, jax.random.PRNGKey(i + 1))
        sync(metrics)
        best = min(best, time.perf_counter() - t0)
    return B * STEPS / best


def measure_reference_baseline(insts, budget_s: float = 120.0) -> float:
    """Reference architecture on this host: C++ obs generator (compiled from
    /root/reference) + torch 2M forward, per step, over the same workload.
    Extrapolates env-steps/s from as many steps as fit in the budget."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["env_steps_per_s"]
    try:
        import tempfile

        import torch

        from tests.oracle import REF as _ref, build_oracle  # noqa: F401
        from mapf_gpt_tpu.models.convert import params_to_torch_state_dict
        from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
        import importlib.util
        import types

        if "loguru" not in sys.modules:
            stub = types.ModuleType("loguru")
            stub.logger = types.SimpleNamespace(
                warning=lambda *a, **k: None, debug=lambda *a, **k: None,
                info=lambda *a, **k: None)
            sys.modules["loguru"] = stub
        spec_ = importlib.util.spec_from_file_location(
            "ref_model", os.path.join(REF, "mapf_gpt", "model.py"))
        ref_model = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(ref_model)

        import jax

        cfg = CONFIGS["2M"]
        params = init_params(cfg, jax.random.PRNGKey(0))
        tcfg = ref_model.GPTConfig(block_size=256, vocab_size=67,
                                   n_layer=cfg.n_layer, n_head=cfg.n_head,
                                   n_embd=cfg.n_embd, dropout=0.0, bias=False)
        tmodel = ref_model.GPT(tcfg)
        sd = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in
              params_to_torch_state_dict(params, cfg).items()}
        tmodel.load_state_dict(sd, strict=False)
        tmodel.eval()

        # reference per-step pipeline cost = C++ tokenization (all envs,
        # amortized over a multi-step replay) + torch batched forward per step
        with tempfile.TemporaryDirectory() as td:
            binary = build_oracle(td)
            if binary is None:
                raise RuntimeError("reference oracle build failed")
            from tests.oracle import run_oracle

            sample_envs, s_steps = 8, 16
            t0 = time.perf_counter()
            for e in range(sample_envs):
                inst = insts[e]
                pos = np.repeat(inst.starts[None], s_steps, axis=0)
                acts = np.vstack([np.full((1, A), -1),
                                  np.zeros((s_steps - 1, A), dtype=int)])
                run_oracle(binary, inst.grid, inst.goals, pos, acts)
            t_obs = time.perf_counter() - t0

            batch = torch.randint(0, 67, (sample_envs * A, 256))
            gen = torch.Generator()
            gen.manual_seed(0)
            with torch.no_grad():
                tmodel.act(batch, generator=gen)  # warmup
            t0 = time.perf_counter()
            n_fwd = 0
            while time.perf_counter() - t0 < budget_s and n_fwd < s_steps:
                with torch.no_grad():
                    tmodel.act(batch, generator=gen)
                n_fwd += 1
            t_fwd = time.perf_counter() - t0
            per_step = t_obs / s_steps + t_fwd / n_fwd
            env_steps_per_s = sample_envs / per_step
    except Exception as exc:  # baseline unavailable -> record zero marker
        print(f"# baseline measurement failed: {exc}", file=sys.stderr)
        env_steps_per_s = float("nan")
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"env_steps_per_s": env_steps_per_s,
                   "note": "reference C++ obsgen + torch 2M on host CPU, "
                           f"B={B} A={A} extrapolated"}, f)
    return env_steps_per_s


def main():
    insts = build_instances()
    value = measure_tpu(insts)
    baseline = measure_reference_baseline(insts)
    vs = value / baseline if baseline and np.isfinite(baseline) else None
    print(json.dumps({
        "metric": "env_steps_per_s_per_chip_2M",
        "value": round(value, 1),
        "unit": f"env-steps/s (B={B} envs x {A} agents, 128-step episodes)",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
