"""Grid dynamics and collision arbitration — pure JAX, static shapes.

The reference delegates dynamics to pogema (external pip package, soft
collision system: ``collision_system: soft`` in every eval config,
ref:eval_configs/01-random/01-random.yaml:7).  pogema is not vendored in the
reference repo, so these semantics are re-implemented from the published
description ("an agent's move is canceled if it conflicts with another
agent's move"):

- 5 discrete actions: wait / up / down / left / right
  (ref:dataset/tokenizer/generate_observations.py:10-17).
- A move into an obstacle cell is canceled (the agent waits).
- Vertex conflict: if two or more agents would occupy the same cell, all
  conflicting *movers* are canceled (a stationary agent always keeps its
  cell).
- Edge (swap) conflict: two agents exchanging cells are both canceled.
- Cancellations cascade: a canceled agent re-occupies its old cell, which can
  invalidate further moves — resolution iterates to a fixpoint
  (``lax.while_loop``; converges in at most A rounds, typically 1-2).

The arbitration is fully deterministic and RNG-free.  It is kept in its own
module so alternative arbiters (priority order, block_both) can be swapped in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mapf_gpt_tpu.ops.vocab import MOVES

MOVES_ARR = jnp.asarray(MOVES, dtype=jnp.int32)  # [5, 2]


def propose_moves(grid: jnp.ndarray, pos: jnp.ndarray, actions: jnp.ndarray,
                  active: jnp.ndarray) -> jnp.ndarray:
    """Desired next cells after obstacle masking (no agent-agent conflicts yet).

    grid: bool [H, W] (True = obstacle); pos: int32 [A, 2]; actions: int32 [A];
    active: bool [A].  The grid carries an obstacle border, so desired cells
    are always in bounds.
    """
    delta = MOVES_ARR[jnp.clip(actions, 0, 4)]
    desired = pos + delta
    blocked = grid[desired[:, 0], desired[:, 1]]
    move_ok = jnp.logical_and(active, jnp.logical_not(blocked))
    return jnp.where(move_ok[:, None], desired, pos)


def resolve_collisions(pos: jnp.ndarray, desired: jnp.ndarray,
                       active: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Soft collision arbitration to fixpoint. Returns final positions [A, 2]."""
    h, w = hw
    n_cells = h * w
    pos_lin = pos[:, 0] * w + pos[:, 1]

    def lin(p):
        return p[:, 0] * w + p[:, 1]

    # Inactive agents scatter to an out-of-range index and are dropped.
    pos_idx = jnp.where(active, pos_lin, n_cells)

    def round_fn(des):
        des_lin = lin(des)
        des_idx = jnp.where(active, des_lin, n_cells)
        moving = jnp.logical_and(active, des_lin != pos_lin)
        # vertex conflicts: count desired cells (stationary agents claim their own)
        counts = jnp.zeros((n_cells,), dtype=jnp.int32).at[des_idx].add(
            1, mode="drop")
        vertex = counts[des_lin] > 1
        # swap conflicts: the occupant of my target cell is moving into my cell.
        # Occupancy is unique under these dynamics, so the scatters are
        # conflict-free.
        occ_dest = jnp.full((n_cells,), -1, dtype=jnp.int32).at[pos_idx].set(
            des_lin, mode="drop")
        occupied = jnp.zeros((n_cells,), dtype=jnp.bool_).at[pos_idx].set(
            True, mode="drop")
        swap = jnp.logical_and(occupied[des_lin], occ_dest[des_lin] == pos_lin)
        revert = jnp.logical_and(moving, jnp.logical_or(vertex, swap))
        return jnp.where(revert[:, None], pos, des)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        des, _ = state
        new = round_fn(des)
        return new, jnp.any(new != des)

    first = round_fn(desired)
    final, _ = jax.lax.while_loop(cond, body, (first, jnp.any(first != desired)))
    return final


def step_positions(grid: jnp.ndarray, pos: jnp.ndarray, actions: jnp.ndarray,
                   active: jnp.ndarray) -> jnp.ndarray:
    """Full position update: propose + arbitrate."""
    desired = propose_moves(grid, pos, actions, active)
    return resolve_collisions(pos, desired, active, grid.shape)
