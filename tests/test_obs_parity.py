"""Bit-parity of the on-device tokenizer against the reference C++ generator.

Scenarios roll random commanded actions through our JAX env; the resulting
positions + commanded actions are replayed through the compiled reference
ObservationGenerator, and the full 256-token contexts must match exactly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapf_gpt_tpu.envs import env as menv
from mapf_gpt_tpu.maps import pad_grid, random_grid, sample_instance
from mapf_gpt_tpu.parallel.rollout import replay_rollout

from .oracle import build_oracle, run_oracle

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "obs_golden.npz")


@pytest.fixture(scope="session")
def oracle_bin(tmp_path_factory):
    path = build_oracle(str(tmp_path_factory.mktemp("oracle")))
    if path is None:
        pytest.skip("reference oracle unavailable")
    return path


def _rollout_tokens(grid, starts, goals, actions_per_step):
    """Run our env + tokenizer; returns (positions [S,A,2], tokens [S,A,256]).

    Step 0 is the post-reset state (reference: create_agents + update with -1).
    """
    a = len(starts)
    h, w = grid.shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=a,
                            max_episode_steps=10**6)
    state = jax.jit(menv.reset, static_argnums=0)(
        spec, jnp.asarray(grid), jnp.asarray(starts),
        jnp.asarray(goals)[:, None, :], jnp.ones((a,), bool))
    positions, tokens = replay_rollout(
        spec, state, jnp.asarray(actions_per_step, dtype=jnp.int32))
    return np.asarray(positions), np.asarray(tokens)


def _scenario(seed, size=16, num_agents=8, steps=6):
    rng = np.random.RandomState(seed)
    inst = sample_instance(random_grid(size, 0.25, seed), num_agents, seed)
    actions = rng.randint(0, 5, size=(steps, num_agents))
    return inst, actions


def _compare(oracle_bin, inst, actions):
    positions, ours = _rollout_tokens(inst.grid, inst.starts, inst.goals, actions)
    s = len(actions) + 1
    oracle_actions = np.vstack([np.full((1, inst.num_agents), -1), actions])
    theirs = run_oracle(oracle_bin, inst.grid, inst.goals, positions,
                        oracle_actions)
    np.testing.assert_array_equal(ours, theirs)
    return ours


def test_single_agent_empty_grid(oracle_bin):
    grid = pad_grid(np.zeros((11, 11), dtype=bool))
    starts = np.asarray([[8, 8]], dtype=np.int32)
    goals = np.asarray([[12, 13]], dtype=np.int32)
    actions = np.asarray([[4], [4], [2], [1], [0]])
    inst = type("I", (), dict(grid=grid, starts=starts, goals=goals,
                              num_agents=1))
    _compare(oracle_bin, inst, actions)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_multi_agent_random_grids(oracle_bin, seed):
    inst, actions = _scenario(seed)
    _compare(oracle_bin, inst, actions)


def test_dense_crowd(oracle_bin):
    # 14+ agents within each other's radius: exercises the 13-neighbor cap
    # and (manhattan, id) tie-breaking
    grid = pad_grid(np.zeros((9, 9), dtype=bool))
    free = [(i, j) for i in range(5, 12) for j in range(5, 12)]
    rng = np.random.RandomState(7)
    picks = rng.permutation(len(free))
    starts = np.asarray([free[k] for k in picks[:16]], dtype=np.int32)
    goals = np.asarray([free[k] for k in picks[16:32]], dtype=np.int32)
    actions = rng.randint(0, 5, size=(5, 16))
    inst = type("I", (), dict(grid=grid, starts=starts, goals=goals,
                              num_agents=16))
    _compare(oracle_bin, inst, actions)


def test_golden_fixture_regression():
    """Offline regression: committed oracle outputs (works without /root/reference)."""
    if not os.path.exists(FIXTURE):
        pytest.skip("golden fixture not generated yet")
    data = np.load(FIXTURE)
    _, ours = _rollout_tokens(data["grid"], data["starts"], data["goals"],
                              data["actions"])
    np.testing.assert_array_equal(ours, data["tokens"])


if __name__ == "__main__":
    # regenerate the committed golden fixture (requires /root/reference)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        binary = build_oracle(td)
        assert binary
        inst, actions = _scenario(123, size=20, num_agents=12, steps=8)
        positions, ours = _rollout_tokens(inst.grid, inst.starts, inst.goals,
                                          actions)
        oracle_actions = np.vstack([np.full((1, inst.num_agents), -1), actions])
        theirs = run_oracle(binary, inst.grid, inst.goals, positions,
                            oracle_actions)
        np.testing.assert_array_equal(ours, theirs)
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, grid=inst.grid, starts=inst.starts,
                            goals=inst.goals, actions=actions, tokens=theirs)
        print("golden fixture written:", FIXTURE)
