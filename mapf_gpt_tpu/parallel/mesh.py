"""Device mesh + sharding helpers.

The reference's distribution story is torch DDP over NCCL for training
(ref:train.py:118-131) and dask process fan-out for eval
(ref:eval_configs yaml ``parallel_backend: balanced_dask``).  Here both
collapse into one ``jax.sharding.Mesh`` with a ``data`` axis spanning all
chips (ICI within a slice, DCN across slices after
``jax.distributed.initialize``):

- training: micro-batches sharded over ``data``, params replicated, gradient
  psum inserted by XLA,
- rollouts/eval: env instances sharded over ``data``, params replicated —
  the only collectives are final metric reductions.

A ``model`` axis is provisioned for optional tensor-parallel 85M serving, but
the reference has no TP and none is required for parity (SURVEY §2.3).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, tree: Any, axis: int = 0) -> Any:
    """Shard every array in `tree` along `axis` over the data axis.

    Single-process: a device_put with a NamedSharding.  Multi-host (one
    process per host under jax.distributed): each process passes its *local*
    slice and the pieces assemble into one global array
    (jax.make_array_from_process_local_data), so data loaders keep their
    per-process file sharding."""
    sh = data_sharded(mesh, axis)
    if jax.process_count() > 1:
        # each process supplies an equal local slice; the global extent along
        # `axis` is nproc x local.  Passing global_shape explicitly matters:
        # without it make_array_from_process_local_data treats the local
        # slice as the whole global array, silently building a different
        # "global" array on every process (caught by the round-5 2-process
        # run, tests/test_multiprocess.py).
        nproc = jax.process_count()

        def put(x):
            x = np.asarray(x)
            gshape = list(x.shape)
            gshape[axis] *= nproc
            return jax.make_array_from_process_local_data(
                sh, x, tuple(gshape))

        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def sharded_train_step(mesh: Mesh, train_step):
    """Wrap a train_step for the mesh: params/opt replicated, batch sharded on
    the per-micro-batch axis (axis 1 of [accum, B, ...])."""
    rep = replicated(mesh)
    batch_sh = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        train_step,
        in_shardings=(rep, batch_sh, batch_sh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def sharded_rollout(mesh: Mesh, run):
    """Wrap a batch rollout: params replicated, env-state batch sharded."""
    rep = replicated(mesh)
    env_sh = data_sharded(mesh, 0)
    return jax.jit(run, in_shardings=(rep, env_sh, rep),
                   out_shardings=(env_sh, env_sh))


def sharded_eval_step(mesh: Mesh, eval_step):
    """Wrap an eval step for the mesh: params replicated, batch sharded on
    axis 0, scalar outputs replicated — XLA inserts the cross-shard mean
    reduction (the trainer's run_eval would otherwise evaluate the full
    batch redundantly on device 0 of every process)."""
    rep = replicated(mesh)
    batch_sh = data_sharded(mesh, 0)
    return jax.jit(eval_step, in_shardings=(rep, batch_sh, batch_sh),
                   out_shardings=(rep, rep))
