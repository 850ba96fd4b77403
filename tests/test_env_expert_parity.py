"""Closed-loop expert <-> env parity gate (VERDICT r1 item 3a).

pogema cannot run in this sandbox, so the strongest available substitute
for trajectory parity is the solver-as-oracle: the JAX env must accept
every feasible LaCAM* joint plan verbatim — zero collision cancellations —
and its episode metrics (SoC, makespan, ep_length) must equal the values
computed directly from the expert paths with the reference definitions
(ref:dataset/lacam/lacam3/src/metrics.cpp:3-60)."""

import numpy as np
import pytest

from mapf_gpt_tpu.maps import maze_grid, random_grid, sample_instance

try:
    from mapf_gpt_tpu.dataset import expert
    expert.get_lib()
    HAVE_LACAM = True
except Exception:
    HAVE_LACAM = False

needs_lacam = pytest.mark.skipif(not HAVE_LACAM,
                                 reason="native LaCAM unavailable")


def _ref_costs(paths: np.ndarray) -> np.ndarray:
    """Per-agent cost: last step the agent is off its goal, +1 (0 if it
    starts on goal and never leaves) — ref:metrics.cpp get_sum_of_costs."""
    goals = paths[-1]
    off = np.any(paths != goals[None], axis=-1)          # [T+1, A]
    t_idx = np.arange(paths.shape[0])[:, None]
    last_off = np.where(off, t_idx, -1).max(axis=0)      # [A]
    return (last_off + 1).astype(np.int64)


@needs_lacam
@pytest.mark.parametrize("kind,agents,seed", [
    ("random", 16, 3), ("random", 32, 7), ("maze", 16, 11)])
def test_env_accepts_expert_plan_exactly(kind, agents, seed):
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.envs.metrics import episode_metrics
    from mapf_gpt_tpu.parallel.rollout import replay_rollout

    grid = (random_grid(17, 0.3, seed) if kind == "random"
            else maze_grid(17, seed))
    inst = sample_instance(grid, agents, seed)
    paths = expert.solve_with_escalation(inst.grid, inst.starts, inst.goals,
                                         time_limits=(1.0, 5.0))
    assert paths is not None, "expert failed on a sampled instance"
    actions = expert.paths_to_actions(paths)             # [T, A]
    t_steps = len(actions)

    spec = menv.MapfEnvSpec(height=inst.grid.shape[0],
                            width=inst.grid.shape[1],
                            num_agents=agents, max_episode_steps=t_steps)
    state = menv.reset(spec, jnp.asarray(inst.grid),
                       jnp.asarray(inst.starts),
                       jnp.asarray(inst.goals)[:, None, :],
                       jnp.ones((agents,), dtype=bool))
    positions, _ = replay_rollout(spec, state, jnp.asarray(actions))
    # (a) zero collision cancellations: env reproduces the joint plan exactly
    np.testing.assert_array_equal(np.asarray(positions), paths)

    # (b) metric parity vs the reference definitions computed from paths
    final = state
    for t in range(t_steps):
        final = menv.step(spec, final, jnp.asarray(actions[t]))
    m = episode_metrics(final)
    costs = _ref_costs(paths)
    assert float(m.soc) == float(costs.sum())
    assert float(m.makespan) == float(costs.max())
    assert float(m.csr) == 1.0 and float(m.isr) == 1.0
    # ep_length = first step all agents simultaneously on goal
    on_goal_all = np.all(np.all(paths == paths[-1][None], axis=-1), axis=-1)
    first_all = int(np.argmax(on_goal_all))
    assert float(m.ep_length) == float(first_all)
