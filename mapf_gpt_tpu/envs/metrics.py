"""Episode metrics: CSR / ISR / SoC / makespan / ep_length, computed on-device.

The reference obtains these from pogema's metric wrappers
(ref:experiment_setup/create_env.py:36-45; keys visible in
ref:eval_configs/03-warehouse/03-warehouse.yaml results_views).  Definitions
used here (one-shot MAPF, ``on_target: nothing``):

- ISR: fraction of agents standing on their goal at episode end.
- CSR: 1.0 iff every agent is on its goal at episode end.
- SoC (sum-of-costs): sum over agents of the per-agent path cost — the step
  at which the agent finally arrives at its goal and stays (an agent that
  reaches its goal at step t and never leaves contributes t; an agent never
  resting on its goal contributes the episode length; an agent starting on
  its goal and never leaving contributes 0).
- makespan: max over agents of that same per-agent cost.
- ep_length: the step at which all agents were first simultaneously on goal,
  or ``max_episode_steps`` on truncation.
- agents_density: active agents / free cells (pogema's AgentsDensityWrapper).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mapf_gpt_tpu.envs.env import EnvState


class EpisodeMetrics(NamedTuple):
    csr: jnp.ndarray        # f32 []
    isr: jnp.ndarray        # f32 []
    soc: jnp.ndarray        # f32 []
    makespan: jnp.ndarray   # f32 []
    ep_length: jnp.ndarray  # f32 []
    agents_density: jnp.ndarray  # f32 []
    throughput: jnp.ndarray  # f32 [] lifelong goals reached / step (pogema's
                             # avg_throughput; 0 for on_target=nothing)


def episode_metrics(state: EnvState) -> EpisodeMetrics:
    active = state.active
    n_active = jnp.maximum(jnp.sum(active), 1)
    on_goal = jnp.all(state.pos == state.goal, axis=-1)
    solved = jnp.logical_and(on_goal, active)
    # state.cost = last step off-goal (-1 if never): arrival cost = cost+1,
    # capped at the number of executed steps for agents that never arrive.
    cost = jnp.minimum(state.cost + 1, state.t)
    cost = jnp.where(jnp.logical_and(active, state.cost >= 0), cost, 0)
    free_cells = jnp.maximum(jnp.sum(jnp.logical_not(state.grid)), 1)
    return EpisodeMetrics(
        csr=jnp.all(jnp.logical_or(on_goal, jnp.logical_not(active))).astype(jnp.float32),
        isr=jnp.sum(solved).astype(jnp.float32) / n_active,
        soc=jnp.sum(cost).astype(jnp.float32),
        makespan=jnp.max(cost).astype(jnp.float32),
        ep_length=state.ep_len.astype(jnp.float32),
        agents_density=jnp.sum(active).astype(jnp.float32) / free_cells,
        throughput=(jnp.sum(state.goals_reached).astype(jnp.float32)
                    / jnp.maximum(state.t, 1).astype(jnp.float32)),
    )
