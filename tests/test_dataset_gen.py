import shutil

import numpy as np
import pytest

from mapf_gpt_tpu.dataset.generate import (
    GenConfig, balance_waits, dedup, episode_samples, generate_shards)
from mapf_gpt_tpu.dataset import expert
from mapf_gpt_tpu.maps import random_grid, sample_instance
from mapf_gpt_tpu.train.data import ArrowShardStream

needs_toolchain = pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="no native toolchain")


def test_dedup():
    toks = np.zeros((4, 8), dtype=np.int8)
    toks[1] += 1
    toks[3] += 1
    gts = np.arange(4, dtype=np.int8)
    t2, g2, seen = dedup(toks, gts)
    assert len(t2) == 2 and list(g2) == [0, 1]
    t3, g3, _ = dedup(toks, gts, seen)
    assert len(t3) == 0


def test_balance_waits():
    rng = np.random.RandomState(0)
    gts = np.asarray([0] * 80 + [5] * 10 + [1] * 10, dtype=np.int8)
    toks = np.arange(100, dtype=np.int8)[:, None].repeat(4, 1)
    t2, g2 = balance_waits(toks, gts, rng, max_wait_frac=0.2)
    waits = (g2 == 0).sum()
    moves = (g2 != 0).sum()
    assert moves == 10
    assert waits <= moves * 0.25 + 1
    assert not (g2 == 5).any()


@needs_toolchain
def test_episode_samples_consistency():
    inst = sample_instance(random_grid(12, 0.15, 2), 4, 2)
    paths = expert.solve_with_escalation(inst.grid, inst.starts, inst.goals,
                                         time_limits=(5.0,))
    toks, gts = episode_samples(inst, paths)
    t_steps = len(toks) // 4
    assert toks.shape == (t_steps * 4, 256)
    assert toks.dtype == np.int8 and gts.dtype == np.int8
    assert set(np.unique(gts)).issubset(set(range(6)))
    # the first snapshot's gt equals the expert's first action
    first_actions = expert.paths_to_actions(paths)[0]
    got = gts.reshape(t_steps, 4)[0]
    real = first_actions != 0
    np.testing.assert_array_equal(got[real], first_actions[real])


@needs_toolchain
def test_generate_shards_end_to_end(tmp_path):
    cfg = GenConfig(num_agents=4, map_size=11, samples_per_shard=256,
                    seed=1, expert_time_limits=(2.0,))
    stats = generate_shards(str(tmp_path), 256, cfg)
    assert stats["samples"] >= 256
    assert stats["solved"] >= 1
    stream = ArrowShardStream(str(tmp_path), batch_size=32, grad_accum=1)
    x, y = next(iter(stream))
    assert x.shape == (1, 32, 256)
    assert ((y >= 0) & (y <= 4)).all()
