"""Export an orbax training checkpoint to the reference torch ckpt layout.

Produces a file the reference's own `GPT` + inference loader consume with
zero missing/unexpected keys (ref:train.py:298-310 dict shape;
ref:mapf_gpt/inference.py:72-85 load path), plus a training-curve JSON
parsed from the trainer log.

Usage:
  python profiles/export_ckpt.py --model 6M --ckpt out/r5_6m \
      --out checkpoints/MAPF-GPT-6M-r5.pt \
      --log logs/train_r5_6m.log --curve checkpoints/curve-6M-r5.json \
      --note "round 5, single v5e chip (batch 2048, grad-accum 1)"
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--log", default=None)
    ap.add_argument("--curve", default=None)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    import numpy as np
    import torch

    from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
    from mapf_gpt_tpu.models.convert import params_to_torch_state_dict
    from mapf_gpt_tpu.train.train_step import (TrainConfig, init_train_state)
    from mapf_gpt_tpu.utils import checkpoint as ckpt

    import jax

    cfg = CONFIGS[args.model]
    params = init_params(cfg, jax.random.PRNGKey(0))
    state = init_train_state(params, TrainConfig())
    state, meta = ckpt.restore_checkpoint(args.ckpt, state)
    it = int(state.step)
    sd = {k: torch.tensor(np.ascontiguousarray(v), dtype=torch.float32)
          for k, v in params_to_torch_state_dict(
              jax.device_get(state.params), cfg).items()}
    out = {
        "model": sd,
        "model_args": dict(n_layer=cfg.n_layer, n_head=cfg.n_head,
                           n_embd=cfg.n_embd, block_size=cfg.block_size,
                           bias=cfg.bias, vocab_size=cfg.vocab_size,
                           dropout=cfg.dropout),
        "iter_num": it,
        "best_val_loss": (meta or {}).get("val_loss"),
        "config": {"note": args.note, "trained_in": "mapf_gpt_tpu"},
    }
    torch.save(out, args.out)
    print(f"wrote {args.out} (iter {it})")

    if args.log and args.curve:
        from mapf_gpt_tpu.train.curve import parse_logs

        curve = parse_logs([args.log])
        curve["note"] = args.note
        with open(args.curve, "w") as f:
            json.dump(curve, f)
        print(f"wrote {args.curve} ({len(curve['val'])} val points)")


if __name__ == "__main__":
    main()
