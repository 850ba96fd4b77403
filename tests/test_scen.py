"""MovingAI .map/.scen parsing + native LaCAM solve of scen instances
(ref:dataset/lacam/lacam3/src/instance.cpp:28-66, ref:dataset/lacam/main.cpp:99-138)."""

import numpy as np
import pytest

from mapf_gpt_tpu.maps import parse_movingai_map, parse_scen, scen_instance

MAP_TEXT = """type octile
height 4
width 6
map
......
.@@...
...T..
......
"""

SCEN_TEXT = "\t".join(["version 1"]) + "\n" + "\n".join([
    "0\ttiny.map\t6\t4\t0\t0\t5\t3\t8.0",     # (r0,c0) -> (r3,c5)
    "0\ttiny.map\t6\t4\t1\t1\t4\t2\t9.9",     # start on @ obstacle: skipped
    "0\ttiny.map\t6\t4\t5\t0\t0\t3\t8.0",     # (r0,c5) -> (r3,c0)
    "0\ttiny.map\t6\t4\t9\t0\t0\t0\t1.0",     # x out of range: skipped
    "0\ttiny.map\t6\t4\t2\t0\t2\t3\t3.0",     # (r0,c2) -> (r3,c2)
])


def test_parse_movingai_map():
    grid = parse_movingai_map(MAP_TEXT)
    assert grid.shape == (4, 6)
    assert grid[1, 1] and grid[1, 2] and grid[2, 3]   # @ and T blocked
    assert not grid[0, 0] and not grid[3, 5]


def test_parse_scen_filtering():
    grid = parse_movingai_map(MAP_TEXT)
    starts, goals = parse_scen(SCEN_TEXT, grid)
    np.testing.assert_array_equal(starts, [[0, 0], [0, 5], [0, 2]])
    np.testing.assert_array_equal(goals, [[3, 5], [3, 0], [3, 2]])
    s2, g2 = parse_scen(SCEN_TEXT, grid, num_agents=2)
    assert len(s2) == 2


def test_scen_instance_padded():
    inst = scen_instance(MAP_TEXT, SCEN_TEXT, num_agents=3, map_name="tiny")
    assert inst.grid.shape == (14, 16)  # +5 border each side
    np.testing.assert_array_equal(inst.starts[0], [5, 5])
    with pytest.raises(ValueError):
        scen_instance(MAP_TEXT, SCEN_TEXT, num_agents=64)


def test_scen_solve_with_native_lacam():
    """The reference CLI's mode: map+scen in, solution out, validated."""
    from mapf_gpt_tpu.dataset import expert

    try:
        expert.get_lib()
    except Exception:
        pytest.skip("native toolchain unavailable")
    inst = scen_instance(MAP_TEXT, SCEN_TEXT, num_agents=3)
    paths = expert.solve_with_escalation(inst.grid, inst.starts, inst.goals,
                                         time_limits=(1.0,))
    assert paths is not None
    np.testing.assert_array_equal(paths[0], inst.starts)
    np.testing.assert_array_equal(paths[-1], inst.goals)
    # per-step moves are unit or wait, and never enter obstacles
    deltas = np.abs(paths[1:] - paths[:-1]).sum(axis=-1)
    assert deltas.max() <= 1
    assert not inst.grid[paths[..., 0], paths[..., 1]].any()
