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
    """Device-put every array in `tree` sharded along `axis` over data."""
    sh = data_sharded(mesh, axis)
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
