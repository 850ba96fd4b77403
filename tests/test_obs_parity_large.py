"""Large-map bit-parity vs the reference C++ observation generator.

These scenarios exercise the reference's *hierarchical* cost2go machinery,
which small-map tests never reach: the 64-lattice all-pairs precompute
(ref:mapf_gpt/observation_generator.cpp:43-132) activates on maps wider than
``grid_step=64``, and the per-agent ``Cost2GoPartial`` 2x64 window recompute
(ref:observation_generator.cpp:200-286,432-485) fires when an agent nears its
window border.  Our design replaces the hierarchy with dense per-goal fields
(ops/cost2go.py), so equality here shows the two approaches agree bit-for-bit
at movingai scale — measured 0 mismatched tokens over all scenarios (see
PARITY.md for the numbers).
"""

import numpy as np
import pytest

from mapf_gpt_tpu.maps import pad_grid, random_grid, sample_instance

from .oracle import build_oracle, run_oracle
from .test_obs_parity import _compare, _rollout_tokens


@pytest.fixture(scope="session")
def oracle_bin(tmp_path_factory):
    path = build_oracle(str(tmp_path_factory.mktemp("oracle_large")))
    if path is None:
        pytest.skip("reference oracle unavailable")
    return path


@pytest.mark.parametrize("size,agents", [(96, 16), (128, 12)])
def test_large_random_maps(oracle_bin, size, agents):
    """>64-cell maps: the reference takes its lattice cost2go path."""
    rng = np.random.RandomState(size)
    inst = sample_instance(random_grid(size, 0.15, size), agents, size)
    actions = rng.randint(0, 5, size=(8, agents))
    _compare(oracle_bin, inst, actions)


def test_window_border_crossing_march(oracle_bin):
    """An agent marching 100 cells on an empty 160x160 map is guaranteed to
    leave its initial Cost2GoPartial window (half-width 64), forcing the
    reference's windowed recompute; tokens must still match exactly."""
    grid = pad_grid(np.zeros((160, 160), dtype=bool))
    starts = np.asarray([[80, 10], [82, 12]], dtype=np.int32)
    goals = np.asarray([[80, 150], [82, 148]], dtype=np.int32)
    actions = np.full((100, 2), 4)  # all right
    inst = type("I", (), dict(grid=grid, starts=starts, goals=goals,
                              num_agents=2))
    ours = _compare(oracle_bin, inst, actions)
    # sanity: the march really moved beyond the initial window half-width
    positions, _ = _rollout_tokens(grid, starts, goals, actions)
    assert positions[-1, 0, 1] - positions[0, 0, 1] > 64
