"""Imitation-training driver: the ``train.py`` equivalent, pjit-data-parallel.

Usage (mirrors ``torchrun ... train.py experiment_setup/config-6M.py``,
ref:README.md:109):

    python -m mapf_gpt_tpu.train.loop --model 6M \
        --train-data dataset/train --valid-data dataset/validation \
        --out-dir out [--max-iters 30000] [--batch-size 2048] [--resume]

Covers the reference loop's behavior (ref:train.py:284-362): cosine LR with
warmup, eval every ``eval_interval`` iters over ``eval_iters`` batches,
checkpoint each eval (always_save_checkpoint), resume, grad-accum 16, loss /
MFU / steps-per-s logging.  Multi-host: run one process per host under
``jax.distributed`` — file sharding uses the global process index.
"""

from __future__ import annotations

import argparse
import os
import json
import time

import jax
import numpy as np

from mapf_gpt_tpu.models.gpt import CONFIGS, GPT, init_params
from mapf_gpt_tpu.parallel import mesh as pmesh
from mapf_gpt_tpu.train.data import ArrowShardStream
from mapf_gpt_tpu.train.train_step import (
    TrainConfig, init_train_state, make_eval_step, make_train_step)
from mapf_gpt_tpu.utils import checkpoint as ckpt
from mapf_gpt_tpu.utils.profiling import (
    Meter, transformer_flops_per_token)

# reference schedules (ref:experiment_setup/config-{2M,6M,85M}.py)
DEFAULTS = {
    "2M": dict(batch_size=4096, max_iters=30000),
    "6M": dict(batch_size=2048, max_iters=30000),
    "85M": dict(batch_size=512, max_iters=400000),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="6M", choices=list(CONFIGS))
    p.add_argument("--train-data", required=True)
    p.add_argument("--valid-data", default=None)
    p.add_argument("--out-dir", default="out")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--grad-accum", type=int, default=16)
    p.add_argument("--eval-interval", type=int, default=500)
    p.add_argument("--eval-iters", type=int, default=40)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--learning-rate", type=float, default=6e-4)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--wandb-project", default=None,
                   help="optional wandb logging (the reference's wandb_log "
                        "flag, ref:train.py:40-43); no-op if wandb is not "
                        "installed")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--config", default=None,
                   help="python config file exec'd over the parsed args "
                        "(the reference configurator semantics)")
    args, extra = p.parse_known_args(argv)
    from mapf_gpt_tpu.utils.configurator import apply_config

    apply_config(args, config_file=args.config,
                 overrides=[e for e in extra if e.startswith("--")])
    return args


def train(args) -> dict:
    if args.distributed:
        # TPU pods auto-detect; for manual process groups (and the CPU
        # multi-process test) pass explicit coordinates via env vars
        coord = os.environ.get("MAPF_GPT_TPU_COORDINATOR")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["MAPF_GPT_TPU_NUM_PROCESSES"]),
                process_id=int(os.environ["MAPF_GPT_TPU_PROCESS_ID"]))
        else:
            jax.distributed.initialize()
    proc, nproc = jax.process_index(), jax.process_count()
    is_main = proc == 0

    cfg = CONFIGS[args.model]
    d = DEFAULTS[args.model]
    batch_size = args.batch_size or d["batch_size"]
    max_iters = args.max_iters or d["max_iters"]
    tc = TrainConfig(learning_rate=args.learning_rate,
                     min_lr=args.learning_rate / 10,
                     lr_decay_iters=max_iters, grad_accum=args.grad_accum)

    mesh = pmesh.make_mesh()
    n_dev = mesh.devices.size
    # the reference divides grad-accum by world size (ref:train.py:130-131);
    # here the data axis divides the per-micro-batch instead
    assert batch_size % n_dev == 0, (batch_size, n_dev)

    params = init_params(cfg, jax.random.PRNGKey(args.seed))
    state = init_train_state(params, tc)
    start_iter = 0
    if args.resume:
        state, meta = ckpt.restore_checkpoint(args.out_dir, state)
        start_iter = int(state.step)
        if is_main:
            print(f"resumed from {args.out_dir} at iter {start_iter}")
    state = pmesh.replicate(mesh, state)

    step_fn = pmesh.sharded_train_step(mesh, make_train_step(cfg, tc))
    eval_fn = pmesh.sharded_eval_step(mesh, make_eval_step(cfg))

    train_stream = iter(ArrowShardStream(
        args.train_data, batch_size, args.grad_accum,
        process_index=proc, process_count=nproc, seed=args.seed))
    valid_stream = (iter(ArrowShardStream(
        args.valid_data, batch_size, 1, process_index=proc,
        process_count=nproc, seed=args.seed + 1))
        if args.valid_data else None)

    n_params = GPT.num_params(jax.device_get(state.params))
    # 6N + 12LHQT is already the fwd+bwd per-token estimate
    # (PaLM appendix B; ref:model.py:228-238 uses it the same way)
    flops_per_step = (transformer_flops_per_token(
        n_params, cfg.n_layer, cfg.n_head, cfg.n_embd // cfg.n_head,
        cfg.block_size) * cfg.block_size
        * batch_size * args.grad_accum)
    meter = Meter(flops_per_step)
    history = []

    wandb = None
    if getattr(args, "wandb_project", None) and is_main:
        try:
            import wandb as _wandb

            wandb = _wandb
            wandb.init(project=args.wandb_project,
                       config={"model": args.model, "batch": batch_size,
                               "max_iters": max_iters, **tc._asdict()})
        except ImportError:
            print("wandb not installed; --wandb-project ignored")

    def run_eval():
        if valid_stream is None:
            return None
        losses, accs = [], []
        for _ in range(args.eval_iters):
            x, y = next(valid_stream)
            # eval batch sharded over the mesh; the scalar means come back
            # replicated (XLA inserts the cross-shard psum)
            loss, acc = eval_fn(state.params,
                                pmesh.shard_batch(mesh, x[0]),
                                pmesh.shard_batch(mesh, y[0]))
            losses.append(float(loss))
            accs.append(float(acc))
        return float(np.mean(losses)), float(np.mean(accs))

    t_start = time.time()
    for it in range(start_iter, max_iters + 1):
        if it % args.eval_interval == 0:
            ev = run_eval()
            if is_main and ev:
                print(f"iter {it}: val_loss {ev[0]:.4f} val_acc {ev[1]:.4f}")
                if wandb:
                    wandb.log({"val/loss": ev[0], "val/acc": ev[1]},
                              step=it)
            if it > start_iter:
                # ALL processes must enter the save: orbax's
                # CheckpointManager barriers across the process group, so a
                # main-only call deadlocks multi-process runs (p0 waits in
                # the save barrier, p1 in the next training collective —
                # caught by the round-5 2-process run)
                ckpt.save_checkpoint(
                    args.out_dir, it, jax.device_get(state),
                    metadata={"model": args.model,
                              "val_loss": ev[0] if ev else None})
        if it == max_iters:
            break
        x, y = next(train_stream)
        x = pmesh.shard_batch(mesh, x, axis=1)
        y = pmesh.shard_batch(mesh, y, axis=1)
        state, loss = step_fn(state, x, y)
        if it % args.log_interval == 0:
            loss = float(loss)  # host sync point
            sps, mfu = meter.tick(steps=args.log_interval)
            history.append({"iter": it, "loss": loss})
            if is_main:
                print(f"iter {it}: loss {loss:.4f} | {sps:.2f} it/s | "
                      f"mfu {mfu * 100:.1f}%")
                if wandb:
                    wandb.log({"train/loss": loss, "perf/steps_per_s": sps,
                               "perf/mfu": mfu}, step=it)
    return {"iters": max_iters, "history": history,
            "wall_s": time.time() - t_start}


if __name__ == "__main__":
    result = train(parse_args())
    print(json.dumps({"final_loss": result["history"][-1]["loss"]
                      if result["history"] else None,
                      "wall_s": result["wall_s"]}))
