import os

import jax
import jax.numpy as jnp
import numpy as np

from mapf_gpt_tpu.models.gpt import GPTConfig, init_params
from mapf_gpt_tpu.parallel import mesh as pmesh
from mapf_gpt_tpu.train.data import ArrowShardStream, write_arrow_shard
from mapf_gpt_tpu.train.train_step import (
    TrainConfig, init_train_state, lr_schedule, make_eval_step,
    make_train_step)
from mapf_gpt_tpu.utils import checkpoint as ckpt

CFG = GPTConfig(n_layer=2, n_head=2, n_embd=32)


def _synthetic_batch(rng, accum, b):
    """Learnable toy task: the target action is a function of token 121."""
    x = rng.randint(0, 67, size=(accum, b, 256)).astype(np.int32)
    y = (x[:, :, 121] % 5).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_loss_decreases():
    tc = TrainConfig(grad_accum=2, warmup_iters=5, lr_decay_iters=50,
                     learning_rate=1e-3)
    params = init_params(CFG, jax.random.PRNGKey(0))
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(CFG, tc), donate_argnums=0)
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(30):
        x, y = _synthetic_batch(rng, 2, 16)
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 30


def test_lr_schedule_matches_reference():
    tc = TrainConfig(learning_rate=6e-4, min_lr=6e-5, warmup_iters=2000,
                     lr_decay_iters=30000)
    sched = lr_schedule(tc)
    # warmup: lr * it / warmup (ref:train.py:263-274)
    np.testing.assert_allclose(float(sched(1000)), 6e-4 * 1000 / 2000,
                               rtol=1e-5)
    np.testing.assert_allclose(float(sched(2000)), 6e-4, rtol=1e-5)
    # beyond decay: min_lr
    np.testing.assert_allclose(float(sched(40000)), 6e-5, rtol=1e-5)
    # midpoint of cosine: (lr + min_lr) / 2
    mid = (2000 + 30000) // 2
    np.testing.assert_allclose(float(sched(mid)), (6e-4 + 6e-5) / 2,
                               rtol=1e-3)


def test_arrow_round_trip(tmp_path):
    rng = np.random.RandomState(0)
    tokens = rng.randint(-10, 60, size=(64, 256)).astype(np.int8)
    actions = rng.randint(0, 6, size=(64,)).astype(np.int8)
    path = str(tmp_path / "chunk_0_part_0.arrow")
    write_arrow_shard(path, tokens, actions)
    stream = ArrowShardStream(str(tmp_path), batch_size=16, grad_accum=2)
    x, y = next(iter(stream))
    assert x.shape == (2, 16, 256) and y.shape == (2, 16)
    assert x.dtype == np.int32
    # contents come from the file (under some permutation)
    assert set(np.unique(x)).issubset(set(np.unique(tokens.astype(np.int32))))


def test_process_sharding_of_files(tmp_path):
    for i in range(4):
        write_arrow_shard(str(tmp_path / f"c_{i}.arrow"),
                          np.zeros((8, 256), dtype=np.int8) + i,
                          np.zeros((8,), dtype=np.int8))
    s0 = ArrowShardStream(str(tmp_path), 4, process_index=0, process_count=2)
    s1 = ArrowShardStream(str(tmp_path), 4, process_index=1, process_count=2)
    assert set(s0.files).isdisjoint(s1.files)
    assert sorted(s0.files + s1.files) == sorted(
        str(tmp_path / f"c_{i}.arrow") for i in range(4))


def test_rescan_slices_stay_stable_as_shards_grow(tmp_path):
    """Shards written after init join the stream without shifting the
    initial contiguous slice boundaries (advisor r3: boundary drift under a
    concurrent generator caused transient overlap/skip between processes)."""
    # realistic names: once part_10 exists it sorts lexicographically BEFORE
    # part_2, which broke the round-4 positional scheme (advisor r4 medium)
    def shard(i):
        return str(tmp_path / f"chunk_600_part_{i}.arrow")

    for i in range(9):
        write_arrow_shard(shard(i), np.zeros((8, 256), dtype=np.int8) + i,
                          np.zeros((8,), dtype=np.int8))
    s0 = ArrowShardStream(str(tmp_path), 4, process_index=0, process_count=2)
    s1 = ArrowShardStream(str(tmp_path), 4, process_index=1, process_count=2)
    base0, base1 = list(s0.files), list(s1.files)
    for i in range(9, 14):  # generator keeps writing, crossing two digits
        write_arrow_shard(shard(i), np.zeros((8, 256), dtype=np.int8) + i,
                          np.zeros((8,), dtype=np.int8))
        f0, f1 = s0._scan(), s1._scan()
        # original slices unchanged, new files dealt disjointly+completely,
        # and the assignment is identical on every rescan
        assert f0[:len(base0)] == base0 and f1[:len(base1)] == base1
        assert set(f0).isdisjoint(f1)
        assert sorted(f0 + f1) == sorted(shard(j) for j in range(i + 1))
        assert (f0, f1) == (s0._scan(), s1._scan())


def test_write_arrow_shard_is_atomic(tmp_path, monkeypatch):
    """The shard appears under its final name only after a complete write
    (temp-name + rename), so a concurrent reader's glob never sees a
    partially-written file."""
    import mapf_gpt_tpu.train.data as data_mod

    seen_at_rename = []
    real_rename = os.rename

    def spy(src, dst):
        seen_at_rename.append((os.path.exists(dst), src.endswith(".tmp")))
        real_rename(src, dst)

    monkeypatch.setattr(data_mod.os, "rename", spy)
    path = str(tmp_path / "chunk_0_part_0.arrow")
    write_arrow_shard(path, np.zeros((8, 256), dtype=np.int8),
                      np.zeros((8,), dtype=np.int8))
    assert seen_at_rename == [(False, True)]
    assert os.path.exists(path) and not os.path.exists(path + ".tmp")


def test_checkpoint_round_trip(tmp_path):
    tc = TrainConfig(grad_accum=1)
    params = init_params(CFG, jax.random.PRNGKey(0))
    state = init_train_state(params, tc)
    ckpt.save_checkpoint(str(tmp_path / "ck"), 7, jax.device_get(state),
                         metadata={"model": "test"})
    assert ckpt.latest_step(str(tmp_path / "ck")) == 7
    restored, meta = ckpt.restore_checkpoint(str(tmp_path / "ck"),
                                             jax.device_get(state))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(state), restored)


def test_sharded_train_step_on_mesh():
    mesh = pmesh.make_mesh()  # 8 fake cpu devices
    tc = TrainConfig(grad_accum=2)
    params = init_params(CFG, jax.random.PRNGKey(0))
    state = pmesh.replicate(mesh, init_train_state(params, tc))
    step = pmesh.sharded_train_step(mesh, make_train_step(CFG, tc))
    rng = np.random.RandomState(0)
    x, y = _synthetic_batch(rng, 2, 16)
    x = pmesh.shard_batch(mesh, x, axis=1)
    y = pmesh.shard_batch(mesh, y, axis=1)
    state, loss = step(state, x, y)
    assert np.isfinite(float(loss))
    # parity with single-device step on the same data
    params2 = init_params(CFG, jax.random.PRNGKey(0))
    state2 = init_train_state(params2, tc)
    x2, y2 = _synthetic_batch(np.random.RandomState(0), 2, 16)
    step2 = jax.jit(make_train_step(CFG, tc))
    state2, loss2 = step2(state2, x2, y2)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-4)


def test_trainer_cli_resume(tmp_path):
    """End-to-end resume through the trainer driver: train 2 iters, save,
    resume to 4 — the second run must pick up at the checkpointed step."""
    import numpy as np

    from mapf_gpt_tpu.train import loop as tloop
    from mapf_gpt_tpu.train.data import write_arrow_shard

    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 67, size=(256, 256)).astype(np.int8)
    actions = rng.randint(0, 5, size=(256,)).astype(np.int8)
    (tmp_path / "d").mkdir()
    write_arrow_shard(str(tmp_path / "d" / "chunk_0_part_0.arrow"),
                      tokens, actions)

    def args(max_iters, resume):
        return tloop.parse_args([
            "--model", "2M", "--train-data", str(tmp_path / "d"),
            "--out-dir", str(tmp_path / "out"), "--batch-size", "32",
            "--grad-accum", "1", "--max-iters", str(max_iters),
            "--eval-interval", "2", "--log-interval", "1"]
            + (["--resume"] if resume else []))

    r1 = tloop.train(args(2, resume=False))
    assert [h["iter"] for h in r1["history"]] == [0, 1]
    r2 = tloop.train(args(4, resume=True))
    # resumed at iter 2 (the checkpoint written at the iter-2 eval)
    assert [h["iter"] for h in r2["history"]] == [2, 3]
