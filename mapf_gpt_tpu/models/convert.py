"""Torch checkpoint -> flax params conversion.

Loads the reference's ``ckpt.pt`` / ``MAPF-GPT-{2M,6M,85M}.pt`` files
(dict with ``model`` state-dict and ``model_args``,
ref:train.py:298-310, ref:mapf_gpt/inference.py:72-85) and produces the
parameter pytree for :class:`mapf_gpt_tpu.models.gpt.GPT`.

Key map (torch -> flax):
  transformer.wte.weight            -> wte                (shared with head)
  transformer.wpe.weight            -> wpe
  transformer.h.{i}.ln_1.weight     -> h_{i}/ln_1/scale
  transformer.h.{i}.attn.c_attn.*   -> h_{i}/attn/c_attn  (kernel transposed)
  transformer.h.{i}.attn.c_proj.*   -> h_{i}/attn/c_proj
  transformer.h.{i}.ln_2.weight     -> h_{i}/ln_2/scale
  transformer.h.{i}.mlp.c_fc.*      -> h_{i}/mlp/c_fc
  transformer.h.{i}.mlp.c_proj.*    -> h_{i}/mlp/c_proj
  transformer.ln_f.weight           -> ln_f/scale
  lm_head.weight                    -> (dropped: weight-tied to wte)

Torch ``nn.Linear`` stores [out, in]; flax Dense kernels are [in, out], hence
the transposes.  A ``_orig_mod.`` prefix from torch.compile checkpoints is
stripped (ref:mapf_gpt/inference.py:33-44).
"""

from __future__ import annotations

import numpy as np

from mapf_gpt_tpu.models.gpt import GPTConfig


def strip_prefix(state_dict: dict, prefix: str = "_orig_mod.") -> dict:
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in state_dict.items()}


def torch_state_dict_to_params(state_dict: dict, cfg: GPTConfig) -> dict:
    """Convert a numpy-fied reference state dict into a flax params pytree."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in
          strip_prefix(state_dict).items()}

    def linear(prefix: str) -> dict:
        out = {"kernel": sd[prefix + ".weight"].T}
        if prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"]
        return out

    def ln(prefix: str) -> dict:
        out = {"scale": sd[prefix + ".weight"]}
        if prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"]
        return out

    p: dict = {
        "wte": sd["transformer.wte.weight"],
        "wpe": sd["transformer.wpe.weight"],
        "ln_f": ln("transformer.ln_f"),
    }
    for i in range(cfg.n_layer):
        t = f"transformer.h.{i}"
        p[f"h_{i}"] = {
            "ln_1": ln(f"{t}.ln_1"),
            "attn": {"c_attn": linear(f"{t}.attn.c_attn"),
                     "c_proj": linear(f"{t}.attn.c_proj")},
            "ln_2": ln(f"{t}.ln_2"),
            "mlp": {"c_fc": linear(f"{t}.mlp.c_fc"),
                    "c_proj": linear(f"{t}.mlp.c_proj")},
        }
    return {"params": p}


def load_torch_checkpoint(path: str):
    """Load a reference .pt checkpoint -> (GPTConfig, flax params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    args = dict(ckpt["model_args"])
    cfg = GPTConfig(
        block_size=args.get("block_size", 256),
        vocab_size=args.get("vocab_size", 67),
        n_layer=args["n_layer"], n_head=args["n_head"], n_embd=args["n_embd"],
        bias=args.get("bias", False),
    )
    sd = {k: v.detach().cpu().numpy() for k, v in ckpt["model"].items()}
    return cfg, torch_state_dict_to_params(sd, cfg)


def params_to_torch_state_dict(params: dict, cfg: GPTConfig) -> dict:
    """Inverse map, for exporting our trained weights to the reference layout."""
    p = params["params"]
    sd: dict[str, np.ndarray] = {
        "transformer.wte.weight": np.asarray(p["wte"]),
        "transformer.wpe.weight": np.asarray(p["wpe"]),
        "transformer.ln_f.weight": np.asarray(p["ln_f"]["scale"]),
        "lm_head.weight": np.asarray(p["wte"]),
    }
    for i in range(cfg.n_layer):
        b = p[f"h_{i}"]
        t = f"transformer.h.{i}"
        sd[f"{t}.ln_1.weight"] = np.asarray(b["ln_1"]["scale"])
        sd[f"{t}.ln_2.weight"] = np.asarray(b["ln_2"]["scale"])
        for mod, sub in (("attn", "c_attn"), ("attn", "c_proj"),
                         ("mlp", "c_fc"), ("mlp", "c_proj")):
            w = np.asarray(b[mod][sub]["kernel"]).T
            sd[f"{t}.{mod}.{sub}.weight"] = w
            if "bias" in b[mod][sub]:
                sd[f"{t}.{mod}.{sub}.bias"] = np.asarray(b[mod][sub]["bias"])
    return sd
