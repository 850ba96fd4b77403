"""Worker for tests/test_multiprocess.py — runs as its own process.

Modes:
  train   — one data-parallel train step on a deterministic global batch
  rollout — one 4-env batched rollout through mesh.shard_batch

Invoked either single-process (8 fake CPU devices, the reference result) or
as one of N jax.distributed processes (4 fake devices each); both paths save
the same outputs so the parent can compare.  The distributed path exercises
exactly what `train/loop.py --distributed` and the sharded eval use:
make_array_from_process_local_data assembly (mesh.shard_batch), replicated
params, XLA-inserted gradient psum over gloo.
"""

import argparse
import dataclasses
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "rollout"], required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--pid", type=int, default=-1)
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--port", type=int, default=12611)
    args = ap.parse_args()

    dist = args.pid >= 0
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + ("4" if dist else "8"))
    import jax

    if dist:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(f"localhost:{args.port}", args.nproc,
                                   args.pid)

    import jax.numpy as jnp
    import numpy as np

    from mapf_gpt_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8, mesh.devices.shape

    def local_slice(arr, axis):
        """The slice of a global array this process feeds to shard_batch."""
        if not dist:
            return arr
        n = arr.shape[axis] // args.nproc
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(args.pid * n, (args.pid + 1) * n)
        return arr[tuple(sl)]

    if args.mode == "train":
        from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
        from mapf_gpt_tpu.train.train_step import (
            TrainConfig, init_train_state, make_train_step)

        cfg = dataclasses.replace(CONFIGS["2M"], n_layer=2, n_embd=64, n_head=2)
        tc = TrainConfig(grad_accum=2, warmup_iters=1, lr_decay_iters=4)
        params = init_params(cfg, jax.random.PRNGKey(7))
        state = pmesh.replicate(mesh, init_train_state(params, tc))
        step_fn = pmesh.sharded_train_step(mesh, make_train_step(cfg, tc))

        rng = np.random.RandomState(0)
        x = rng.randint(0, cfg.vocab_size, size=(2, 64, 256)).astype(np.int32)
        y = rng.randint(0, 5, size=(2, 64)).astype(np.int32)
        xs = pmesh.shard_batch(mesh, local_slice(x, 1), axis=1)
        ys = pmesh.shard_batch(mesh, local_slice(y, 1), axis=1)
        assert xs.shape == x.shape, (xs.shape, x.shape)  # global assembly
        state, loss = step_fn(state, xs, ys)
        leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
        out = {"loss": np.asarray(loss),
               "leaf0": np.asarray(leaves[0]),
               "leafsum": np.asarray([float(np.sum(np.abs(l)))
                                      for l in leaves])}
    else:
        from mapf_gpt_tpu.envs.env import MapfEnvSpec
        from mapf_gpt_tpu.maps import maze_grid, sample_instance
        from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
        from mapf_gpt_tpu.parallel.rollout import (batch_reset,
                                                   make_batch_rollout)

        cfg = dataclasses.replace(CONFIGS["2M"], n_layer=2, n_embd=64, n_head=2)
        params = pmesh.replicate(mesh, init_params(cfg, jax.random.PRNGKey(3)))
        insts = [sample_instance(maze_grid(9, seed=s), 4, seed=s)
                 for s in range(8)]
        h, w = insts[0].grid.shape
        spec = MapfEnvSpec(height=h, width=w, num_agents=4,
                           max_episode_steps=8)
        grids = np.stack([i.grid for i in insts])
        starts = np.stack([i.starts for i in insts])
        goals = np.stack([i.goals[:, None, :] for i in insts])
        active = np.ones((8, 4), dtype=bool)
        run = make_batch_rollout(spec, cfg, do_sample=False)
        states = batch_reset(
            spec, jnp.asarray(local_slice(grids, 0)),
            jnp.asarray(local_slice(starts, 0)),
            jnp.asarray(local_slice(goals, 0)),
            jnp.asarray(local_slice(active, 0)))
        states = pmesh.shard_batch(mesh, jax.device_get(states), axis=0)
        sharded = pmesh.sharded_rollout(mesh, run)
        key = jax.random.PRNGKey(0)
        final, metrics = sharded(params, states, key)
        if dist:
            # metrics come back sharded over the data axis; gather the
            # global view (the multi-host analogue of the harness's fetch)
            from jax.experimental import multihost_utils

            out = {k: np.asarray(multihost_utils.process_allgather(
                       v, tiled=True))
                   for k, v in metrics._asdict().items()}
        else:
            out = {k: np.asarray(jax.device_get(v))
                   for k, v in metrics._asdict().items()}

    if not dist or args.pid == 0:
        np.savez(args.out, **out)
    print(f"worker pid={args.pid} done", flush=True)


if __name__ == "__main__":
    main()
