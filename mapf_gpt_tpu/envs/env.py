"""The vectorized MAPF environment: functional reset/step, static shapes.

Replaces the reference's pogema env + wrapper stack
(ref:experiment_setup/create_env.py:36-60).  The whole episode loop —
dynamics, on-target semantics, auto-termination, metric accumulators — lives
in jittable pure functions over an :class:`EnvState` pytree, so it can be
``vmap``-ed over thousands of instances and ``shard_map``-ed over a mesh.

Reference semantics covered:

- ``on_target: nothing`` (one-shot MAPF): agents stay on their goals, the
  episode terminates when every agent is simultaneously on target, truncates
  at ``max_episode_steps`` (ref:example.py:41-50).
- ``on_target: restart`` (lifelong): an agent reaching its goal advances to
  the next goal from a per-agent queue (ref:experiment_setup/create_env.py:28,
  pogema's ``global_lifelong_targets_xy``).  Pass ``lifelong_goals`` with
  K > 1 queued goals per agent at reset.
- Action history ring with the *commanded* (not executed) action, as the
  reference records the model's sampled action regardless of collision
  cancellation (ref:mapf_gpt/inference.py:162-168 feeding
  ref:mapf_gpt/observation_generator.cpp:432-462).

State is frozen once the episode is over, so a fixed-length ``lax.scan`` over
``max_episode_steps`` produces exact metrics with no dynamic control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mapf_gpt_tpu.envs.dynamics import step_positions
from mapf_gpt_tpu.ops.cost2go import cost2go_device
from mapf_gpt_tpu.ops.vocab import NUM_PREV_ACTIONS


class EnvState(NamedTuple):
    """Per-instance state. All arrays static-shaped; add a leading batch dim
    via vmap for vectorized rollouts."""

    pos: jnp.ndarray          # int32 [A, 2] padded coords
    goal: jnp.ndarray         # int32 [A, 2] current goal
    goal_idx: jnp.ndarray     # int32 [A] index into the lifelong queue
    hist: jnp.ndarray         # int32 [A, P] action symbols 0..5 ('n','w','u','d','l','r'), oldest first
    t: jnp.ndarray            # int32 [] steps taken
    done: jnp.ndarray         # bool [] all active agents on goal (terminal)
    cost: jnp.ndarray         # int32 [A] last timestep the agent was off-goal
                              # (0 incl. reset; -1 = never off-goal). The
                              # per-agent path cost is cost+1 capped at t;
                              # see envs/metrics.py.
    ep_len: jnp.ndarray       # int32 [] step at which done fired (else max steps)
    goals_reached: jnp.ndarray  # int32 [A] lifelong goals achieved (uncapped,
                              # unlike goal_idx which clamps at K-1)
    # episode constants (carried in the pytree so vmap can batch over maps)
    grid: jnp.ndarray         # bool [A?, H, W] -> [H, W] obstacles incl. border
    c2g: jnp.ndarray          # int32 [A, K, H, W] cost2go field per queued goal
    goals_queue: jnp.ndarray  # int32 [A, K, 2]
    active: jnp.ndarray       # bool [A]


class MapfEnvSpec(NamedTuple):
    """Static configuration baked into the jit."""

    height: int
    width: int
    num_agents: int           # padded agent slot count A
    max_episode_steps: int = 128
    on_target: str = "nothing"   # "nothing" | "restart"
    num_queued_goals: int = 1    # K; >1 only used with on_target="restart"
    c2g_chunk: int = 0        # reset-sweep chunking: compute the A*K cost2go
                              # fields `c2g_chunk` goals at a time (0 = all at
                              # once).  The dense per-goal cache itself fits
                              # HBM even at warehouse scale (K=16: ~20 MiB/env)
                              # — it is the *sweep intermediates* of an
                              # all-A*K-at-once relaxation that OOM large
                              # lifelong batches at reset compile; chunking
                              # bounds them while keeping steady-state steps
                              # pure gathers (no per-step recompute, unlike
                              # the reference's on-demand Cost2GoPartial,
                              # ref:mapf_gpt/observation_generator.cpp:432-485,
                              # which exists to bound host CPU memory)
    lazy_c2g: bool = False    # lifelong-only: hold each agent's *current*
                              # goal field [A, 1, H, W] instead of the whole
                              # queue's [A, K, H, W], and recompute an
                              # agent's field inside step() when its queue
                              # advances — the TPU analogue of the
                              # reference's recompute-on-goal-change
                              # (ref:mapf_gpt/observation_generator.cpp:432-485).
                              # K-fold smaller state lifts the lifelong
                              # envs/chip cap; the price is a warm-start
                              # relaxation in every step (one verification
                              # round when no agent advanced — see
                              # ops/cost2go.relax_fixpoint)


def reset(spec: MapfEnvSpec, grid: jnp.ndarray, starts: jnp.ndarray,
          goals_queue: jnp.ndarray, active: jnp.ndarray) -> EnvState:
    """Build the initial state and the dense cost2go fields on device.

    grid: bool [H, W]; starts: int32 [A, 2]; goals_queue: int32 [A, K, 2];
    active: bool [A].  Inactive (padding) slots should carry starts==goals on
    free cells; they never move and are masked out of observations.
    """
    a, k = spec.num_agents, spec.num_queued_goals
    if spec.lazy_c2g and spec.on_target == "restart":
        # current-goal fields only; step() recomputes on queue-advance
        c2g = cost2go_device(grid, goals_queue[:, 0].astype(jnp.int32))
        return _initial_state(spec, grid, starts, goals_queue, active,
                              c2g[:, None])
    goals_flat = goals_queue.reshape(a * k, 2).astype(jnp.int32)
    chunk = spec.c2g_chunk
    if chunk and chunk < a * k:
        # bound the relaxation-sweep intermediates: lax.map serializes the
        # sweeps over goal chunks (see MapfEnvSpec.c2g_chunk)
        n = a * k
        pad = (-n) % chunk
        if pad:
            goals_flat = jnp.concatenate(
                [goals_flat, jnp.zeros((pad, 2), jnp.int32)], axis=0)
        c2g = jax.lax.map(lambda g: cost2go_device(grid, g),
                          goals_flat.reshape(-1, chunk, 2))
        c2g = c2g.reshape(-1, spec.height, spec.width)[:n]
    else:
        c2g = cost2go_device(grid, goals_flat)
    c2g = c2g.reshape(a, k, spec.height, spec.width)
    return _initial_state(spec, grid, starts, goals_queue, active, c2g)


def _initial_state(spec: MapfEnvSpec, grid, starts, goals_queue, active,
                   c2g) -> EnvState:
    a = spec.num_agents
    on_goal = jnp.all(starts == goals_queue[:, 0], axis=-1)
    return EnvState(
        pos=starts.astype(jnp.int32),
        goal=goals_queue[:, 0].astype(jnp.int32),
        goal_idx=jnp.zeros((a,), jnp.int32),
        hist=jnp.zeros((a, NUM_PREV_ACTIONS), jnp.int32),  # 'n' * P
        t=jnp.int32(0),
        done=jnp.all(jnp.logical_or(on_goal, jnp.logical_not(active))),
        cost=jnp.where(jnp.logical_or(on_goal, jnp.logical_not(active)),
                       jnp.int32(-1), jnp.int32(0)),
        ep_len=jnp.int32(spec.max_episode_steps),
        goals_reached=jnp.zeros((a,), jnp.int32),
        grid=grid,
        c2g=c2g,
        goals_queue=goals_queue.astype(jnp.int32),
        active=active,
    )


def current_c2g(state: EnvState) -> jnp.ndarray:
    """The [A, H, W] cost2go fields for each agent's *current* goal.

    Works for both layouts: dense [A, K, H, W] (index by goal_idx) and lazy
    [A, 1, H, W] (the single slot IS the current field — the clip makes the
    gather read it regardless of goal_idx)."""
    idx = jnp.minimum(state.goal_idx, state.c2g.shape[1] - 1)
    return jnp.take_along_axis(
        state.c2g, idx[:, None, None, None], axis=1).squeeze(1)


def step(spec: MapfEnvSpec, state: EnvState, actions: jnp.ndarray) -> EnvState:
    """One environment transition. actions: int32 [A] in 0..4."""
    frozen = jnp.logical_or(state.done, state.t >= spec.max_episode_steps)
    act = jnp.where(frozen, jnp.zeros_like(actions), actions)

    new_pos = step_positions(state.grid, state.pos, act, state.active)
    new_pos = jnp.where(frozen, state.pos, new_pos)

    # action history records the commanded action: 0..4 -> 'w'..'r' = 1..5
    hist_sym = jnp.where(act < 0, 0, act + 1).astype(jnp.int32)
    new_hist = jnp.concatenate([state.hist[:, 1:], hist_sym[:, None]], axis=1)
    new_hist = jnp.where(frozen, state.hist, new_hist)

    t = jnp.where(frozen, state.t, state.t + 1)

    # lifelong goal advancement
    on_goal = jnp.all(new_pos == state.goal, axis=-1)
    if spec.on_target == "restart":
        advance = jnp.logical_and(on_goal, state.active)
        new_idx = jnp.minimum(
            state.goal_idx + advance.astype(jnp.int32),
            jnp.int32(spec.num_queued_goals - 1))
        new_idx = jnp.where(frozen, state.goal_idx, new_idx)
        new_goal = jnp.take_along_axis(
            state.goals_queue, new_idx[:, None, None], axis=1).squeeze(1)
        # throughput accounting: each of the K queued goals counts exactly
        # once (pogema spawns a fresh goal per arrival, so re-reaching or
        # standing on the exhausted final goal must not re-count)
        achieved = jnp.logical_and(
            jnp.logical_and(advance, jnp.logical_not(frozen)),
            state.goals_reached < spec.num_queued_goals)
        goals_reached = state.goals_reached + achieved.astype(jnp.int32)
        if spec.lazy_c2g:
            # warm-start relaxation: unchanged agents' fields are already
            # fixpoints (one verification round); agents whose queue just
            # advanced are re-seeded from their new goal and relaxed to
            # convergence in the same step (the TPU analogue of
            # ref:observation_generator.cpp:432-485's recompute-on-change)
            from mapf_gpt_tpu.ops.cost2go import (INF, goal_seed,
                                                  relax_fixpoint)

            changed = jnp.logical_and(new_idx != state.goal_idx,
                                      jnp.logical_not(frozen))
            fresh, free = goal_seed(state.grid, new_goal)
            exist = jnp.where(state.c2g[:, 0] < 0, INF, state.c2g[:, 0])
            seed = jnp.where(changed[:, None, None], fresh, exist)
            dist = relax_fixpoint(seed, free)
            c2g = jnp.where(dist >= INF, jnp.int32(-1), dist)[:, None]
        else:
            c2g = state.c2g
    else:
        new_idx = state.goal_idx
        new_goal = state.goal
        goals_reached = state.goals_reached
        c2g = state.c2g

    on_goal_now = jnp.all(new_pos == new_goal, axis=-1)
    cost = jnp.where(jnp.logical_or(on_goal_now, frozen), state.cost, t)
    all_done = jnp.all(jnp.logical_or(on_goal_now, jnp.logical_not(state.active)))
    if spec.on_target == "restart":
        all_done = jnp.bool_(False)  # lifelong episodes only truncate
    done = jnp.logical_or(state.done, all_done)
    ep_len = jnp.where(jnp.logical_and(done, jnp.logical_not(state.done)),
                       t, state.ep_len)

    return state._replace(pos=new_pos, goal=new_goal, goal_idx=new_idx,
                          hist=new_hist, t=t, done=done, cost=cost,
                          ep_len=ep_len, goals_reached=goals_reached,
                          c2g=c2g)
