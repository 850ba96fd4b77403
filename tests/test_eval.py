import numpy as np

from mapf_gpt_tpu.eval.animation import render_episode_svg
from mapf_gpt_tpu.eval.harness import (
    EpisodeSpec, Evaluator, expand_grid_search, tabular_view)
from mapf_gpt_tpu.maps import MapRegistry, random_grid


def test_expand_grid_search_product():
    cfg = {
        "max_episode_steps": 64,
        "num_agents": {"grid_search": [2, 4]},
        "seed": {"grid_search": [0, 1, 2]},
        "map_name": {"grid_search": ["a", "b"]},
    }
    specs = expand_grid_search(cfg)
    assert len(specs) == 12
    assert all(s.max_episode_steps == 64 for s in specs)
    assert {(s.map_name, s.num_agents, s.seed) for s in specs} == {
        (m, a, s) for a in (2, 4) for s in (0, 1, 2) for m in ("a", "b")}


def test_expand_scalar_only():
    specs = expand_grid_search({"map_name": "x", "num_agents": 3, "seed": 7})
    assert specs == [EpisodeSpec(map_name="x", num_agents=3, seed=7)]


def test_tabular_view_grouping():
    rows = [
        {"map_name": "m", "num_agents": 2, "seed": 0, "CSR": 1.0, "ISR": 1.0,
         "SoC": 4.0, "makespan": 2.0, "ep_length": 2.0, "runtime": 0.1,
         "avg_agents_density": 0.1},
        {"map_name": "m", "num_agents": 2, "seed": 1, "CSR": 0.0, "ISR": 0.5,
         "SoC": 8.0, "makespan": 4.0, "ep_length": 4.0, "runtime": 0.1,
         "avg_agents_density": 0.1},
    ]
    out = tabular_view(rows, drop_keys=["seed", "map_name"])
    assert "0.5000" in out            # mean CSR
    lines = out.splitlines()
    assert len(lines) == 2            # header + one group row


def test_evaluator_small_run():
    import jax

    from mapf_gpt_tpu.models.gpt import GPTConfig, init_params

    reg = MapRegistry()
    reg.register("tiny", random_grid(8, 0.1, 0))
    cfg = GPTConfig(n_layer=1, n_head=1, n_embd=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = [EpisodeSpec("tiny", 2, s, max_episode_steps=8) for s in range(3)]
    ev = Evaluator(reg, cfg, params, batch_envs=2, do_sample=False)
    res = ev.run(specs)
    assert len(res.rows) == 3
    for r in res.rows:
        assert 0.0 <= r["CSR"] <= 1.0
        assert r["ep_length"] <= 8


def test_policy_batch_microbatching_matches_full():
    """Chunked forward (incl. ragged final chunk padding) == unchunked."""
    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs.env import MapfEnvSpec
    from mapf_gpt_tpu.maps import sample_instance
    from mapf_gpt_tpu.models.gpt import GPTConfig, init_params
    from mapf_gpt_tpu.parallel.rollout import batch_reset, make_batch_rollout

    cfg = GPTConfig(n_layer=1, n_head=2, n_embd=16)
    params = init_params(cfg, jax.random.PRNGKey(1))
    grid = random_grid(8, 0.1, 3)
    insts = [sample_instance(grid, 3, s) for s in range(2)]
    h, w = insts[0].grid.shape
    spec = MapfEnvSpec(height=h, width=w, num_agents=3, max_episode_steps=6)
    grids = jnp.asarray(np.stack([i.grid for i in insts]))
    starts = jnp.asarray(np.stack([i.starts for i in insts]))
    goals = jnp.asarray(np.stack([i.goals for i in insts]))[:, :, None, :]
    active = jnp.ones((2, 3), dtype=bool)
    states = batch_reset(spec, grids, starts, goals, active)
    key = jax.random.PRNGKey(0)
    run_full = make_batch_rollout(spec, cfg, do_sample=False)
    run_chunk = make_batch_rollout(spec, cfg, do_sample=False,
                                   policy_batch=4)  # 6 contexts -> 4+2(pad)
    _, m_full = run_full(params, states, key)
    _, m_chunk = run_chunk(params, states, key)
    for a, b in zip(m_full, m_chunk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_evaluator_final_chunk_tiering():
    """A short final chunk runs at a tiered batch, not duplicated to full."""
    import jax

    from mapf_gpt_tpu.models.gpt import GPTConfig, init_params

    reg = MapRegistry()
    reg.register("tiny", random_grid(8, 0.1, 0))
    cfg = GPTConfig(n_layer=1, n_head=1, n_embd=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    # 9 specs with batch_envs=64 -> one chunk of 9, tiered to 16 (not 64)
    specs = [EpisodeSpec("tiny", 2, s, max_episode_steps=4) for s in range(9)]
    ev = Evaluator(reg, cfg, params, batch_envs=64, do_sample=False)
    res = ev.run(specs)
    assert len(res.rows) == 9
    assert {r["seed"] for r in res.rows} == set(range(9))


def test_svg_render():
    grid = np.zeros((6, 6), dtype=bool)
    grid[0] = True
    positions = np.asarray([[[2, 2], [3, 3]], [[2, 3], [3, 4]]])
    goals = np.asarray([[2, 5], [3, 5]])
    svg = render_episode_svg(grid, positions, goals)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<animate") == 4  # 2 agents x (cx, cy)
    assert "#84a58c" in svg            # obstacles drawn


def test_evaluator_lifelong_restart():
    """An on_target=restart spec runs end-to-end with a K>1 goal queue and
    reports avg_throughput."""
    import jax

    from mapf_gpt_tpu.models.gpt import GPTConfig, init_params

    reg = MapRegistry()
    reg.register("tiny", random_grid(8, 0.1, 0))
    cfg = GPTConfig(n_layer=1, n_head=1, n_embd=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = [EpisodeSpec("tiny", 2, s, max_episode_steps=8,
                         on_target="restart", num_queued_goals=4)
             for s in range(2)]
    ev = Evaluator(reg, cfg, params, batch_envs=2, do_sample=True)
    res = ev.run(specs)
    assert len(res.rows) == 2
    for r in res.rows:
        assert r["ep_length"] == 8  # lifelong only truncates
        assert r["avg_throughput"] >= 0.0


def test_expand_grid_search_lifelong_defaults():
    specs = expand_grid_search({"map_name": "x", "num_agents": 2, "seed": 0,
                                "on_target": "restart"})
    assert specs[0].num_queued_goals == 16
    specs = expand_grid_search({"map_name": "x", "num_agents": 2, "seed": 0})
    assert specs[0].num_queued_goals == 1


def test_build_instance_free_cell_exhaustion():
    """Padding slots must not raise when free cells - agents < slots
    (dense 5x5 puzzles at the 8-slot tier)."""
    grid = np.ones((5, 5), dtype=bool)
    grid[1, 1:4] = False  # exactly 3 free cells
    reg = MapRegistry()
    reg.register("dense", grid)
    ev = Evaluator(reg, None, None)
    spec = EpisodeSpec("dense", 2, 0, max_episode_steps=4)
    g, starts, goals, active = ev._build_instance(spec, (16, 16), 8)
    assert active[:2].all() and not active[2:].any()
    # inactive slots park on free cells (possibly reused)
    for k in range(2, 8):
        assert not g[starts[k, 0], starts[k, 1]]
        assert (goals[k] == starts[k][None]).all()


def test_masked_rollout_differs():
    """mask_cost2go rollouts produce different trajectories (the reference's
    input-ablation switches, ref:mapf_gpt/inference.py:23-26)."""
    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs.env import MapfEnvSpec
    from mapf_gpt_tpu.maps import sample_instance
    from mapf_gpt_tpu.models.gpt import GPTConfig, init_params
    from mapf_gpt_tpu.ops.masking import MaskConfig
    from mapf_gpt_tpu.parallel.rollout import (
        _tokens_of, batch_reset, make_batch_rollout)

    cfg = GPTConfig(n_layer=1, n_head=2, n_embd=16)
    # amplify the random init so the policy is input-sensitive (fresh inits
    # are near input-independent and masking would not flip any action)
    params = jax.tree.map(lambda x: x * 8.0,
                          init_params(cfg, jax.random.PRNGKey(1)))
    grid = random_grid(8, 0.15, 5)
    insts = [sample_instance(grid, 4, s) for s in range(2)]
    h, w = insts[0].grid.shape
    spec = MapfEnvSpec(height=h, width=w, num_agents=4, max_episode_steps=12)
    grids = jnp.asarray(np.stack([i.grid for i in insts]))
    starts = jnp.asarray(np.stack([i.starts for i in insts]))
    goals = jnp.asarray(np.stack([i.goals for i in insts]))[:, :, None, :]
    active = jnp.ones((2, 4), dtype=bool)
    states = batch_reset(spec, grids, starts, goals, active)
    # tokens differ under the mask
    t_plain = _tokens_of(jax.tree.map(lambda x: x[0], states))
    t_mask = _tokens_of(jax.tree.map(lambda x: x[0], states),
                        mask_cfg=MaskConfig(mask_cost2go=True))
    assert not np.array_equal(np.asarray(t_plain), np.asarray(t_mask))
    # and the rollout takes a different path (sampled actions shift with the
    # masked logits; compare the commanded-action history ring)
    key = jax.random.PRNGKey(0)
    run_plain = make_batch_rollout(spec, cfg, do_sample=True)
    run_mask = make_batch_rollout(spec, cfg, do_sample=True,
                                  mask_cfg=MaskConfig(mask_cost2go=True))
    f_plain, _ = run_plain(params, states, key)
    f_mask, _ = run_mask(params, states, key)
    assert not np.array_equal(np.asarray(f_plain.hist),
                              np.asarray(f_mask.hist))


def test_resolve_algorithm_block():
    """The suite yaml's algorithms block constructs the evaluator config
    (ref:eval_configs/05-puzzles/05-puzzles.yaml:33-43)."""
    import argparse

    from mapf_gpt_tpu.eval.run import resolve_algorithm

    suite_cfg = {"algorithms": {
        "MAPF-GPT-2M": {"name": "MAPF-GPT", "parallel_backend":
                        "balanced_dask", "num_process": 4,
                        "path_to_weights": "weights/MAPF-GPT-2M.pt",
                        "mask_greed_action": True}}}
    args = argparse.Namespace(algo="MAPF-GPT-2M", mask=None)
    algo_cfg, mask_cfg = resolve_algorithm(suite_cfg, args)
    assert algo_cfg["path_to_weights"] == "weights/MAPF-GPT-2M.pt"
    assert mask_cfg.mask_greed_action and mask_cfg.any
    assert not mask_cfg.mask_cost2go
    # CLI masks OR into the yaml's switches
    args = argparse.Namespace(algo="MAPF-GPT-2M", mask=["cost2go"])
    _, mask_cfg = resolve_algorithm(suite_cfg, args)
    assert mask_cfg.mask_greed_action and mask_cfg.mask_cost2go
    # unknown algo key fails loudly
    import pytest
    args = argparse.Namespace(algo="nope", mask=None)
    with pytest.raises(SystemExit):
        resolve_algorithm(suite_cfg, args)


def test_benchmark_cli_passthrough(monkeypatch, tmp_path):
    """benchmark.py forwards --algo/--mask/--weights-root/--seed to eval.run
    (advisor r3: suite-yaml algorithm configs and ablations could only be
    driven suite-by-suite)."""
    import os

    from mapf_gpt_tpu.eval import benchmark as bm
    from mapf_gpt_tpu.eval import run as eval_run

    # fake suite dir so the loop body executes
    suite = tmp_path / "01-random"
    suite.mkdir()
    (tmp_path / "results" / "01-random").mkdir(parents=True)

    captured = []
    monkeypatch.setattr(eval_run, "main", lambda argv: captured.append(argv))
    bm.main(["--configs-root", str(tmp_path), "--suites", "01-random",
             "--out-dir", str(tmp_path / "results"),
             "--algo", "MAPF-GPT-2M", "--weights-root", "/w",
             "--mask", "greed_action", "cost2go", "--seed", "7",
             "--argmax", "--limit", "3"])
    assert len(captured) == 1
    argv = captured[0]

    def val(flag):
        return argv[argv.index(flag) + 1]

    assert val("--algo") == "MAPF-GPT-2M"
    assert val("--weights-root") == "/w"
    assert val("--seed") == "7"
    mi = argv.index("--mask")
    assert argv[mi + 1:mi + 3] == ["greed_action", "cost2go"]
    assert "--argmax" in argv and val("--limit") == "3"
    assert os.path.basename(val("--suite")) == "01-random"


def test_runtime_metric_execution_only():
    """runtime rows are positive, shared within a chunk, and come from the
    AOT-compiled execution (compile time excluded)."""
    import jax

    from mapf_gpt_tpu.models.gpt import GPTConfig, init_params

    reg = MapRegistry()
    reg.register("tiny", random_grid(8, 0.1, 0))
    cfg = GPTConfig(n_layer=1, n_head=1, n_embd=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = [EpisodeSpec("tiny", 2, s, max_episode_steps=4) for s in range(4)]
    ev = Evaluator(reg, cfg, params, batch_envs=4, do_sample=False)
    res = ev.run(specs)
    assert len(ev._compiled) == 1          # one AOT compile for the group
    rts = [r["runtime"] for r in res.rows]
    assert all(rt > 0 for rt in rts)
    assert len(set(rts)) == 1              # uniform within the chunk
    # execution alone must be far below a plausible compile time
    assert rts[0] < 5.0


def test_lifelong_queue_depth_bound():
    """K-deep goal queues approximate pogema's unlimited stream from below:
    with one-goal-per-step traffic, K >= T+1 is exact and the K-exhaustion
    bias is (T - (K-1)) goals."""
    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv

    t_max = 8
    grid = np.ones((7, 7), dtype=bool)
    grid[1:4, 1:4] = False
    a, b = (1, 1), (1, 2)

    def run(kq):
        queue = np.asarray(
            [[b, a] * ((kq + 1) // 2)][0][:kq], dtype=np.int32)[None]
        spec = menv.MapfEnvSpec(height=7, width=7, num_agents=1,
                                max_episode_steps=t_max,
                                on_target="restart", num_queued_goals=kq)
        state = jax.jit(menv.reset, static_argnums=0)(
            spec, jnp.asarray(grid), jnp.asarray([a], dtype=jnp.int32),
            jnp.asarray(queue), jnp.ones((1,), bool))
        step = jax.jit(menv.step, static_argnums=0)
        for t in range(t_max):
            # optimal action alternates right/left, one goal per step
            act = 4 if t % 2 == 0 else 3
            state = step(spec, state, jnp.asarray([act], dtype=jnp.int32))
        return int(state.goals_reached[0])

    exact = run(t_max + 1)      # K > T: no exhaustion, one goal per step
    assert exact == t_max
    small = run(4)              # each of the K queued goals counts once
    assert small == 4
    assert exact - small == t_max - 4  # the K-exhaustion bias, bounded by T-K
