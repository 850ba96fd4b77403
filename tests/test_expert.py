import shutil

import numpy as np
import pytest

from mapf_gpt_tpu.dataset import expert
from mapf_gpt_tpu.maps import maze_grid, random_grid, sample_instance

needs_toolchain = pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="no native toolchain")


def _check_solution(grid, starts, goals, paths):
    assert paths is not None
    np.testing.assert_array_equal(paths[0], starts)
    np.testing.assert_array_equal(paths[-1], goals)
    a = len(starts)
    for t in range(1, len(paths)):
        step = np.abs(paths[t] - paths[t - 1]).sum(axis=1)
        assert (step <= 1).all()                        # moves are edges
        cells = {tuple(c) for c in paths[t]}
        assert len(cells) == a                          # no vertex conflicts
        for i in range(a):
            assert not grid[paths[t][i][0], paths[t][i][1]]
        for i in range(a):
            for j in range(i + 1, a):
                assert not (tuple(paths[t][i]) == tuple(paths[t - 1][j]) and
                            tuple(paths[t][j]) == tuple(paths[t - 1][i]))


@needs_toolchain
@pytest.mark.parametrize("seed", [0, 1])
def test_solve_random_instance(seed):
    inst = sample_instance(random_grid(16, 0.2, seed), 12, seed)
    paths = expert.solve_with_escalation(inst.grid, inst.starts, inst.goals,
                                         seed=seed, time_limits=(5.0,))
    _check_solution(inst.grid, inst.starts, inst.goals, paths)


@needs_toolchain
def test_solve_maze_instance():
    inst = sample_instance(maze_grid(17, 3), 8, 3)
    paths = expert.solve_with_escalation(inst.grid, inst.starts, inst.goals,
                                         seed=0, time_limits=(10.0,))
    _check_solution(inst.grid, inst.starts, inst.goals, paths)


@needs_toolchain
def test_paths_to_actions_round_trip():
    inst = sample_instance(random_grid(12, 0.15, 5), 6, 5)
    paths = expert.solve_with_escalation(inst.grid, inst.starts, inst.goals,
                                         time_limits=(5.0,))
    actions = expert.paths_to_actions(paths)
    # replay actions -> must reproduce the paths
    from mapf_gpt_tpu.ops.vocab import MOVES

    pos = paths[0].copy()
    for t in range(len(actions)):
        pos = pos + np.asarray([MOVES[a] for a in actions[t]])
        np.testing.assert_array_equal(pos, paths[t + 1])


@needs_toolchain
def test_unsolvable_returns_none_fast():
    # two agents forced to swap through a single corridor: unsolvable
    grid = np.ones((5, 7), dtype=bool)
    grid[2, 1:6] = False
    starts = np.asarray([[2, 1], [2, 5]], dtype=np.int32)
    goals = np.asarray([[2, 5], [2, 1]], dtype=np.int32)
    paths = expert.solve_with_escalation(grid, starts, goals,
                                         time_limits=(0.5,))
    assert paths is None
    ex = expert.LacamExpert(grid, starts, goals)
    assert ex.failed
    np.testing.assert_array_equal(ex.act(), [0, 0])  # wait fallback


def test_dedup_goals():
    grid = np.zeros((6, 6), dtype=bool)
    goals = np.asarray([[2, 2], [2, 2], [2, 2]], dtype=np.int32)
    out = expert.dedup_goals(grid, goals)
    assert len({tuple(g) for g in out}) == 3
    np.testing.assert_array_equal(out[0], [2, 2])   # first keeps its goal
    for g in out[1:]:                                # others remapped nearby
        assert abs(g[0] - 2) + abs(g[1] - 2) <= 2


@needs_toolchain
def test_lifelong_resolve_on_goal_change():
    """A goal change mid-episode triggers a fresh solve from the current
    positions (ref:dataset/lacam/inference.py:148-188)."""
    grid = np.zeros((8, 8), dtype=bool)
    starts = np.asarray([[0, 0], [7, 7]], dtype=np.int32)
    goals = np.asarray([[0, 3], [7, 4]], dtype=np.int32)
    ex = expert.LacamExpert(grid, starts, goals, time_limits=(1.0,))
    assert not ex.failed
    pos = starts.copy()
    a = ex.act(pos, goals)
    pos = pos + np.asarray([expert_moves(x) for x in a])
    # agent 0's goal advances (lifelong): expert must re-solve
    new_goals = np.asarray([[5, 0], [7, 4]], dtype=np.int32)
    a = ex.act(pos, new_goals)
    assert ex.resolves == 1
    # follow to completion: both agents end on their new goals
    for _ in range(30):
        pos = pos + np.asarray([expert_moves(x) for x in a])
        a = ex.act(pos, new_goals)
    np.testing.assert_array_equal(pos, new_goals)


def expert_moves(action):
    from mapf_gpt_tpu.ops.vocab import MOVES
    return MOVES[action]
