import jax
import jax.numpy as jnp
import numpy as np

from mapf_gpt_tpu.maps import maze_grid, pad_grid, random_grid
from mapf_gpt_tpu.ops.cost2go import cost2go_device, cost2go_host


def _check_grid(grid, goals):
    fields = np.asarray(cost2go_device(jnp.asarray(grid), jnp.asarray(goals, dtype=jnp.int32)))
    for k, goal in enumerate(goals):
        ref = cost2go_host(grid, tuple(goal))
        np.testing.assert_array_equal(fields[k], ref)


def test_empty_grid():
    grid = pad_grid(np.zeros((8, 8), dtype=bool), 1)
    _check_grid(grid, [(4, 4), (1, 1)])


def test_random_grids():
    for seed in range(3):
        grid = pad_grid(random_grid(16, 0.3, seed), 2)
        free = np.argwhere(~grid)
        goals = free[np.random.RandomState(seed).choice(len(free), 4)]
        _check_grid(grid, goals)


def test_maze_grid():
    grid = pad_grid(maze_grid(21, 3))
    free = np.argwhere(~grid)
    goals = free[[0, len(free) // 2, len(free) - 1]]
    _check_grid(grid, goals)


def test_unreachable_marked():
    grid = np.ones((7, 7), dtype=bool)
    grid[1:3, 1:3] = False   # island A
    grid[4:6, 4:6] = False   # island B
    fields = np.asarray(cost2go_device(jnp.asarray(grid), jnp.asarray([[1, 1]], dtype=jnp.int32)))
    assert fields[0][1, 1] == 0
    assert fields[0][4, 4] == -1  # other component unreachable
    assert fields[0][0, 0] == -1  # obstacle


def test_jit_and_vmap():
    grid = pad_grid(random_grid(12, 0.2, 7), 2)
    goals = jnp.asarray([[3, 3], [8, 8]], dtype=jnp.int32)
    f = jax.jit(cost2go_device)
    out = np.asarray(f(jnp.asarray(grid), goals))
    for k in range(2):
        np.testing.assert_array_equal(out[k], cost2go_host(grid, tuple(np.asarray(goals[k]))))
