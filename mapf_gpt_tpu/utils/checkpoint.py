"""Orbax checkpointing: params + optimizer state + step, with resume.

Replaces the reference's single-file torch checkpoint
(``out/ckpt.pt`` with model/optimizer/model_args/iter_num/best_val_loss,
ref:train.py:298-310, resume ref:train.py:190-212) with orbax sharded
checkpoints.  ``models/convert.py`` bridges to/from the torch layout for
interop with reference weights.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    metadata: dict | None = None, keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        args = {"state": ocp.args.StandardSave(state)}
        if metadata is not None:
            args["metadata"] = ocp.args.JsonSave(metadata)
        mgr.save(step, args=ocp.args.Composite(**args))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> int | None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: Any,
                       step: int | None = None) -> tuple[Any, dict | None]:
    """Restore (state, metadata). `template` is a pytree with matching
    structure (e.g. a freshly initialized TrainState)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        restored = mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template)))
        meta = None
        try:
            meta = mgr.restore(
                step, args=ocp.args.Composite(
                    metadata=ocp.args.JsonRestore()))["metadata"]
        except Exception:
            pass
    return restored["state"], meta
