import jax
import jax.numpy as jnp
import numpy as np

from mapf_gpt_tpu.envs import env as menv
from mapf_gpt_tpu.envs.dynamics import step_positions
from mapf_gpt_tpu.envs.metrics import episode_metrics
from mapf_gpt_tpu.maps import pad_grid

A_WAIT, A_UP, A_DOWN, A_LEFT, A_RIGHT = range(5)


def _mini_grid(h=5, w=7):
    return jnp.asarray(pad_grid(np.zeros((h, w), dtype=bool), 1))


def _step_pos(grid, pos, actions, active=None):
    pos = jnp.asarray(pos, dtype=jnp.int32)
    actions = jnp.asarray(actions, dtype=jnp.int32)
    if active is None:
        active = jnp.ones((pos.shape[0],), dtype=bool)
    return np.asarray(step_positions(grid, pos, actions, active))


class TestDynamics:
    def test_free_moves(self):
        grid = _mini_grid()
        out = _step_pos(grid, [[2, 2], [3, 3]], [A_RIGHT, A_DOWN])
        np.testing.assert_array_equal(out, [[2, 3], [4, 3]])

    def test_obstacle_blocks(self):
        grid = _mini_grid()
        out = _step_pos(grid, [[1, 1]], [A_UP])  # border above
        np.testing.assert_array_equal(out, [[1, 1]])

    def test_vertex_conflict_both_cancel(self):
        grid = _mini_grid()
        # both want (2,2)
        out = _step_pos(grid, [[2, 1], [2, 3]], [A_RIGHT, A_LEFT])
        np.testing.assert_array_equal(out, [[2, 1], [2, 3]])

    def test_swap_conflict_cancels(self):
        grid = _mini_grid()
        out = _step_pos(grid, [[2, 2], [2, 3]], [A_RIGHT, A_LEFT])
        np.testing.assert_array_equal(out, [[2, 2], [2, 3]])

    def test_move_into_stationary_cancels(self):
        grid = _mini_grid()
        out = _step_pos(grid, [[2, 2], [2, 3]], [A_RIGHT, A_WAIT])
        np.testing.assert_array_equal(out, [[2, 2], [2, 3]])

    def test_cascade_cancellation(self):
        grid = _mini_grid()
        # agent0 blocked by border -> stays; agent1 follows into agent0's cell ->
        # must cascade-cancel; agent2 follows agent1 likewise.
        out = _step_pos(grid, [[1, 1], [2, 1], [3, 1]], [A_UP, A_UP, A_UP])
        np.testing.assert_array_equal(out, [[1, 1], [2, 1], [3, 1]])

    def test_train_of_agents_moves(self):
        grid = _mini_grid()
        # a moving chain with free head advances intact
        out = _step_pos(grid, [[2, 3], [2, 2], [2, 1]], [A_RIGHT, A_RIGHT, A_RIGHT])
        np.testing.assert_array_equal(out, [[2, 4], [2, 3], [2, 2]])

    def test_inactive_agents_ignored(self):
        grid = _mini_grid()
        active = jnp.asarray([True, False])
        out = _step_pos(grid, [[2, 2], [2, 3]], [A_RIGHT, A_WAIT], active)
        np.testing.assert_array_equal(out[0], [2, 3])  # moves onto inactive slot's cell


def _make_env(starts, goals, h=5, w=7, max_steps=16, on_target="nothing"):
    starts = np.asarray(starts, dtype=np.int32)
    a = len(starts)
    spec = menv.MapfEnvSpec(height=h + 2, width=w + 2, num_agents=a,
                            max_episode_steps=max_steps, on_target=on_target)
    grid = _mini_grid(h, w)
    goals_queue = np.asarray(goals, dtype=np.int32)[:, None, :]
    state = menv.reset(spec, grid, jnp.asarray(starts),
                       jnp.asarray(goals_queue), jnp.ones((a,), dtype=bool))
    return spec, state


class TestEnv:
    def test_reaches_goal_and_terminates(self):
        spec, state = _make_env([[1, 1]], [[1, 3]])
        step = jax.jit(menv.step, static_argnums=0)
        state = step(spec, state, jnp.asarray([A_RIGHT]))
        assert not bool(state.done)
        state = step(spec, state, jnp.asarray([A_RIGHT]))
        assert bool(state.done)
        m = episode_metrics(state)
        assert float(m.csr) == 1.0 and float(m.isr) == 1.0
        assert float(m.soc) == 2.0 and float(m.ep_length) == 2.0

    def test_frozen_after_done(self):
        spec, state = _make_env([[1, 1]], [[1, 2]])
        state = menv.step(spec, state, jnp.asarray([A_RIGHT]))
        assert bool(state.done)
        state2 = menv.step(spec, state, jnp.asarray([A_RIGHT]))
        np.testing.assert_array_equal(np.asarray(state2.pos), np.asarray(state.pos))
        assert int(state2.t) == int(state.t)

    def test_truncation_and_metrics(self):
        spec, state = _make_env([[1, 1], [3, 1]], [[1, 5], [3, 1]], max_steps=2)
        for _ in range(4):
            state = menv.step(spec, state, jnp.asarray([A_WAIT, A_WAIT]))
        m = episode_metrics(state)
        assert int(state.t) == 2
        assert float(m.csr) == 0.0
        assert float(m.isr) == 0.5  # agent1 started on goal
        assert float(m.ep_length) == 2.0

    def test_history_records_commanded_action(self):
        spec, state = _make_env([[1, 1]], [[3, 3]])
        # command a blocked move (up into border): position unchanged but
        # history must record 'u' (symbol 2)
        state = menv.step(spec, state, jnp.asarray([A_UP]))
        np.testing.assert_array_equal(np.asarray(state.pos), [[1, 1]])
        assert state.hist[0, -1] == A_UP + 1
        assert np.all(np.asarray(state.hist[0, :-1]) == 0)  # 'n' padding

    def test_lifelong_goal_advance(self):
        starts = np.asarray([[1, 1]], dtype=np.int32)
        spec = menv.MapfEnvSpec(height=7, width=9, num_agents=1,
                                max_episode_steps=8, on_target="restart",
                                num_queued_goals=2)
        goals_queue = jnp.asarray([[[1, 2], [1, 4]]], dtype=jnp.int32)
        state = menv.reset(spec, _mini_grid(), jnp.asarray(starts), goals_queue,
                           jnp.ones((1,), dtype=bool))
        state = menv.step(spec, state, jnp.asarray([A_RIGHT]))
        # reached first goal -> now targeting second
        np.testing.assert_array_equal(np.asarray(state.goal), [[1, 4]])
        assert not bool(state.done)  # lifelong never terminates early


class TestLifelongThroughput:
    def test_goals_reached_counting(self):
        """Each first arrival at a queued goal counts once; standing on the
        exhausted final goal does not re-count."""
        starts = np.asarray([[1, 1]], dtype=np.int32)
        spec = menv.MapfEnvSpec(height=7, width=9, num_agents=1,
                                max_episode_steps=8, on_target="restart",
                                num_queued_goals=2)
        goals_queue = jnp.asarray([[[1, 2], [1, 3]]], dtype=jnp.int32)
        state = menv.reset(spec, _mini_grid(), jnp.asarray(starts),
                           goals_queue, jnp.ones((1,), dtype=bool))
        state = menv.step(spec, state, jnp.asarray([A_RIGHT]))  # goal 1
        assert int(state.goals_reached[0]) == 1
        state = menv.step(spec, state, jnp.asarray([A_RIGHT]))  # goal 2
        assert int(state.goals_reached[0]) == 2
        # waiting on the exhausted final goal must not re-count
        state = menv.step(spec, state, jnp.asarray([A_WAIT]))
        state = menv.step(spec, state, jnp.asarray([A_WAIT]))
        assert int(state.goals_reached[0]) == 2
        m = episode_metrics(state)
        assert float(m.throughput) == 2.0 / 4.0

    def test_one_shot_throughput_zero(self):
        starts = np.asarray([[1, 1]], dtype=np.int32)
        spec = menv.MapfEnvSpec(height=7, width=9, num_agents=1,
                                max_episode_steps=4)
        goals_queue = jnp.asarray([[[1, 2]]], dtype=jnp.int32)
        state = menv.reset(spec, _mini_grid(), jnp.asarray(starts),
                           goals_queue, jnp.ones((1,), dtype=bool))
        state = menv.step(spec, state, jnp.asarray([A_RIGHT]))
        assert float(episode_metrics(state).throughput) == 0.0


def test_chunked_c2g_reset_matches_unchunked():
    """MapfEnvSpec.c2g_chunk bounds the reset-sweep intermediates without
    changing the fields: chunked == unchunked bit-for-bit, including a chunk
    size that does not divide A*K (padding path)."""
    from mapf_gpt_tpu.maps import maze_grid, sample_instance

    inst = sample_instance(maze_grid(9, seed=3), 3, seed=3,
                           num_lifelong_goals=4)
    h, w = inst.grid.shape
    grid = jnp.asarray(inst.grid)
    starts = jnp.asarray(inst.starts)
    goals = jnp.asarray(inst.lifelong_goals)          # [3, 4, 2]
    active = jnp.ones((3,), dtype=bool)
    base = menv.MapfEnvSpec(height=h, width=w, num_agents=3,
                            max_episode_steps=8, on_target="restart",
                            num_queued_goals=4)
    dense = menv.reset(base, grid, starts, goals, active)
    for chunk in (1, 4, 5):  # 5 does not divide 12 -> exercises the pad
        spec = base._replace(c2g_chunk=chunk)
        chunked = menv.reset(spec, grid, starts, goals, active)
        np.testing.assert_array_equal(np.asarray(dense.c2g),
                                      np.asarray(chunked.c2g))


def test_lazy_lifelong_c2g_matches_dense():
    """lazy_c2g holds [A,1,H,W] and recomputes on queue-advance inside
    step(); the visible trajectory — current_c2g, observations, positions,
    goals, throughput — must equal the dense [A,K,H,W] mode bit-for-bit
    over a whole episode (VERDICT r4 ask #4)."""
    from mapf_gpt_tpu.maps import maze_grid, sample_instance
    from mapf_gpt_tpu.ops.obs import observe

    inst = sample_instance(maze_grid(9, seed=5), 4, seed=7,
                           num_lifelong_goals=6)
    h, w = inst.grid.shape
    grid = jnp.asarray(inst.grid)
    starts = jnp.asarray(inst.starts)
    goals = jnp.asarray(inst.lifelong_goals)          # [4, 6, 2]
    active = jnp.ones((4,), dtype=bool)
    base = menv.MapfEnvSpec(height=h, width=w, num_agents=4,
                            max_episode_steps=24, on_target="restart",
                            num_queued_goals=6)
    lazy_spec = base._replace(lazy_c2g=True)

    dense = menv.reset(base, grid, starts, goals, active)
    lazy = menv.reset(lazy_spec, grid, starts, goals, active)
    assert lazy.c2g.shape == (4, 1, h, w)
    np.testing.assert_array_equal(np.asarray(menv.current_c2g(dense)),
                                  np.asarray(menv.current_c2g(lazy)))

    def greedy(state):
        """Walk each agent down its own cost2go field (ignoring conflicts)
        so queues actually advance within the episode."""
        c2g = np.asarray(menv.current_c2g(state))
        pos = np.asarray(state.pos)
        acts = []
        for a in range(pos.shape[0]):
            i, j = int(pos[a, 0]), int(pos[a, 1])
            d = c2g[a, i, j]
            act = 0
            for cand, (ni, nj) in ((1, (i - 1, j)), (2, (i + 1, j)),
                                   (3, (i, j - 1)), (4, (i, j + 1))):
                if 0 <= c2g[a, ni, nj] < d:
                    act = cand
                    break
            acts.append(act)
        return jnp.asarray(acts, dtype=jnp.int32)

    for _ in range(24):
        acts = greedy(dense)
        dense = menv.step(base, dense, acts)
        lazy = menv.step(lazy_spec, lazy, acts)
        np.testing.assert_array_equal(np.asarray(dense.pos),
                                      np.asarray(lazy.pos))
        np.testing.assert_array_equal(np.asarray(dense.goal),
                                      np.asarray(lazy.goal))
        np.testing.assert_array_equal(np.asarray(dense.goals_reached),
                                      np.asarray(lazy.goals_reached))
        np.testing.assert_array_equal(
            np.asarray(menv.current_c2g(dense)),
            np.asarray(menv.current_c2g(lazy)))
        tok_d = observe(menv.current_c2g(dense), dense.pos, dense.goal,
                        dense.hist, dense.active)
        tok_l = observe(menv.current_c2g(lazy), lazy.pos, lazy.goal,
                        lazy.hist, lazy.active)
        np.testing.assert_array_equal(np.asarray(tok_d), np.asarray(tok_l))
    assert int(dense.goals_reached.sum()) > 0  # the episode advanced queues


def test_lazy_lifelong_under_vmap_scan():
    """The lazy update must compile and run inside the batched rollout
    pattern (vmap over envs + lax.scan over steps) with a consistent carry."""
    from mapf_gpt_tpu.maps import maze_grid, sample_instance

    insts = [sample_instance(maze_grid(9, seed=s), 3, seed=s,
                             num_lifelong_goals=4) for s in (1, 2)]
    h, w = insts[0].grid.shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=3,
                            max_episode_steps=8, on_target="restart",
                            num_queued_goals=4, lazy_c2g=True)
    grids = jnp.stack([jnp.asarray(i.grid) for i in insts])
    starts = jnp.stack([jnp.asarray(i.starts) for i in insts])
    goals = jnp.stack([jnp.asarray(i.lifelong_goals) for i in insts])
    active = jnp.ones((2, 3), dtype=bool)

    state = jax.vmap(lambda g, s, q, a: menv.reset(spec, g, s, q, a))(
        grids, starts, goals, active)

    @jax.jit
    def run(state):
        def body(st, _):
            acts = jnp.ones((2, 3), jnp.int32)  # everyone tries 'up'
            st = jax.vmap(lambda s, a: menv.step(spec, s, a))(st, acts)
            return st, st.goals_reached
        return jax.lax.scan(body, state, None, length=8)

    final, reached = run(state)
    assert final.c2g.shape == (2, 3, 1, h, w)
    assert reached.shape == (8, 2, 3)
