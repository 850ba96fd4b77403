"""Dense cost-to-go (BFS distance-from-goal) fields.

The reference computes cost2go on the host: a dense per-cell BFS on the
dataset side (ref:dataset/tokenizer/cost2go.cpp:8-41) and a hierarchical
windowed variant on the inference side
(ref:mapf_gpt/observation_generator.cpp:43-286).  The hierarchy exists only to
bound CPU cost on huge maps; on TPU we replace both with dense per-goal fields
computed once per episode reset, so the per-step observation becomes pure
gathers (see ops/obs.py).

Two implementations with identical results (4-connected unit-cost BFS):

- :func:`cost2go_host` — numpy BFS, the parity oracle and host path.
- :func:`cost2go_device` — jittable sweep-based distance transform.  Each
  round performs four directional relaxation sweeps (down/up/right/left) via
  ``lax.scan`` (O(H+W) depth, fully vectorized across the other axis and the
  batch of goals), iterated under ``lax.while_loop`` until fixpoint.  A sweep
  propagates distance along an entire straight corridor at once, so the number
  of rounds equals the number of "turns" on the most tortuous shortest path
  (tens, even for mazes) rather than the path length.

Convention: fields are int32, ``-1`` marks unreachable cells and obstacles
(matching ref:dataset/tokenizer/cost2go.cpp:13 which initializes to -1).
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.int32(1 << 20)  # internal "unreached" marker during relaxation


def cost2go_host(grid: np.ndarray, goal: tuple[int, int]) -> np.ndarray:
    """BFS distance-from-goal on the host. grid: bool/int [H,W], True=obstacle."""
    h, w = grid.shape
    dist = np.full((h, w), -1, dtype=np.int32)
    gi, gj = int(goal[0]), int(goal[1])
    if grid[gi, gj]:
        return dist
    dist[gi, gj] = 0
    q = deque([(gi, gj)])
    while q:
        i, j = q.popleft()
        d = dist[i, j] + 1
        for ni, nj in ((i - 1, j), (i + 1, j), (i, j - 1), (i, j + 1)):
            if 0 <= ni < h and 0 <= nj < w and not grid[ni, nj] and dist[ni, nj] < 0:
                dist[ni, nj] = d
                q.append((ni, nj))
    return dist


def _sweep_scan(dist: jnp.ndarray, free: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    """One directional relaxation sweep along `axis` via lax.scan.

    dist: [..., H, W] int32 distances (INF = unreached), free: same shape bool.
    Propagates d[i] = min(d[i], d[i-1] + 1) for free cells, cumulatively along
    the axis, vectorized over all other dims.
    """
    # Move the sweep axis to the front for scan.
    dist_m = jnp.moveaxis(dist, axis, 0)
    free_m = jnp.moveaxis(free, axis, 0)

    def body(carry, xs):
        d_row, f_row = xs
        new = jnp.where(f_row, jnp.minimum(d_row, carry + 1), INF)
        return new, new

    init = jnp.full(dist_m.shape[1:], INF, dtype=jnp.int32)
    _, out = jax.lax.scan(body, init, (dist_m, free_m), reverse=reverse)
    return jnp.moveaxis(out, 0, axis)


def _relax_round(dist: jnp.ndarray, free: jnp.ndarray) -> jnp.ndarray:
    dist = _sweep_scan(dist, free, axis=-2, reverse=False)  # down
    dist = _sweep_scan(dist, free, axis=-2, reverse=True)   # up
    dist = _sweep_scan(dist, free, axis=-1, reverse=False)  # right
    dist = _sweep_scan(dist, free, axis=-1, reverse=True)   # left
    return dist


def relax_fixpoint(dist0: jnp.ndarray, free: jnp.ndarray) -> jnp.ndarray:
    """Iterate directional relaxation rounds until fixpoint.

    dist0: int32 [..., H, W] seed distances (INF = unreached; obstacles may
    carry any value — each sweep forces them to INF); free: bool, same shape.
    A seed that is already a fixpoint costs exactly one verification round,
    which is what makes the lazy lifelong update cheap on no-advance steps
    (envs.env.step)."""

    def cond(state):
        dist, prev_changed = state
        return prev_changed

    def body(state):
        dist, _ = state
        new = _relax_round(dist, free)
        return new, jnp.any(new != dist)

    # one round first so while_loop's condition sees a real "changed" flag
    dist1 = _relax_round(dist0, free)
    dist, _ = jax.lax.while_loop(cond, body, (dist1, jnp.any(dist1 != dist0)))
    return dist


def goal_seed(grid: jnp.ndarray, goals: jnp.ndarray) -> tuple:
    """(dist0, free) relaxation seed for batched per-goal fields.

    grid: bool [H, W]; goals: int32 [N, 2].  Returns ([N,H,W] int32 seed with
    0 at each goal, [N,H,W] bool free)."""
    h, w = grid.shape
    n = goals.shape[0]
    free = jnp.logical_not(grid)[None, :, :]          # [1, H, W]
    free = jnp.broadcast_to(free, (n, h, w))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    at_goal = (rows == goals[:, 0, None, None]) & (cols == goals[:, 1, None, None])
    dist0 = jnp.where(at_goal & free, jnp.int32(0), INF)
    return dist0, free


def cost2go_device(grid: jnp.ndarray, goals: jnp.ndarray) -> jnp.ndarray:
    """Batched dense cost2go fields on device.

    Args:
      grid: bool [H, W], True = obstacle.
      goals: int32 [N, 2] goal cells (one field per goal).

    Returns:
      int32 [N, H, W]; -1 for unreachable cells and obstacles.
    """
    dist0, free = goal_seed(grid, goals)
    dist = relax_fixpoint(dist0, free)
    return jnp.where(dist >= INF, jnp.int32(-1), dist)
