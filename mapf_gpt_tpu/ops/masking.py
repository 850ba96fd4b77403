"""Context masking ablations + token decoding.

The reference ships four input-ablation switches used for its analysis runs
(mask history / cost2go / goal / greedy action —
ref:dataset/tokenizer/tokenizer.py:104-138, exposed on the inference config
ref:mapf_gpt/inference.py:23-26) and a decoder for debugging.  Here both are
vectorized over whole [..., 256] token tensors, so ablations can be fused
into the rollout (apply right after ops/obs.observe).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mapf_gpt_tpu.ops import vocab as V


class MaskConfig(NamedTuple):
    mask_actions_history: bool = False
    mask_cost2go: bool = False
    mask_goal: bool = False
    mask_greed_action: bool = False

    @property
    def any(self) -> bool:
        return any(self)


def _record_offsets():
    base = V.C2G_TOKENS + np.arange(V.NUM_NEIGHBORS) * V.AGENT_RECORD
    return base


def apply_masks(tokens: jnp.ndarray, cfg: MaskConfig) -> jnp.ndarray:
    """tokens: int [..., 256] -> masked copy (ref semantics exactly)."""
    if not cfg.any:
        return tokens
    pos = np.arange(V.CONTEXT_SIZE)
    base = _record_offsets()
    sel_hist = np.zeros(V.CONTEXT_SIZE, dtype=bool)
    sel_goal = np.zeros(V.CONTEXT_SIZE, dtype=bool)
    sel_greedy = np.zeros(V.CONTEXT_SIZE, dtype=bool)
    for b in base:
        sel_hist[b + 4: b + 4 + V.NUM_PREV_ACTIONS] = True
        sel_goal[b + 2: b + 4] = True
        sel_greedy[b + 4 + V.NUM_PREV_ACTIONS] = True
    out = tokens
    if cfg.mask_actions_history:
        out = jnp.where(jnp.asarray(sel_hist), V.ID_PAD, out)
    if cfg.mask_goal:
        out = jnp.where(jnp.asarray(sel_goal), V.ID_PAD, out)
    if cfg.mask_greed_action:
        out = jnp.where(jnp.asarray(sel_greedy), V.ID_PAD, out)
    if cfg.mask_cost2go:
        # every cost2go cell except blocked (-80) becomes "0"
        # (ref:tokenizer.py:116-121)
        in_c2g = jnp.asarray(pos < V.C2G_TOKENS)
        blocked = out == V.ID_UNREACHABLE
        out = jnp.where(in_c2g & ~blocked, V.ID_COORD_ZERO, out)
    return out


# -- decoding (host-side debugging, ref:tokenizer.py:140-185) --------------

_ACTION_CHARS = "nwudlr"


def token_to_str(tok: int) -> str:
    tok = int(tok)
    if tok < V.ID_COORD_ZERO * 2 + 1:
        return str(tok - V.ID_COORD_ZERO)
    if tok == V.ID_UNREACHABLE:
        return str(-4 * V.C2G_LIMIT)
    if tok == V.ID_FAR_NEG:
        return str(-2 * V.C2G_LIMIT)
    if tok == V.ID_FAR_POS:
        return str(2 * V.C2G_LIMIT)
    if V.ID_ACTION_BASE <= tok < V.ID_NEXT_ACTION_BASE:
        return _ACTION_CHARS[tok - V.ID_ACTION_BASE]
    if V.ID_NEXT_ACTION_BASE <= tok < V.ID_PAD:
        return format(tok - V.ID_NEXT_ACTION_BASE, "04b")
    return "!"


def decode_context(tokens: np.ndarray) -> dict:
    """int [256] -> {"cost2go": int [11,11] str-values, "agents": [...]}
    mirroring the reference decoder's structure."""
    tokens = np.asarray(tokens)
    assert tokens.shape == (V.CONTEXT_SIZE,)
    c2g = np.array([token_to_str(t) for t in tokens[:V.C2G_TOKENS]]
                   ).reshape(V.C2G_WINDOW, V.C2G_WINDOW)
    agents = []
    for b in _record_offsets():
        rec = tokens[b: b + V.AGENT_RECORD]
        if rec[0] == V.ID_PAD:
            continue
        agents.append({
            "relative_pos": (int(rec[0]) - V.ID_COORD_ZERO,
                             int(rec[1]) - V.ID_COORD_ZERO),
            "relative_goal": (int(rec[2]) - V.ID_COORD_ZERO,
                              int(rec[3]) - V.ID_COORD_ZERO),
            "previous_actions": [token_to_str(t) for t in rec[4:-1]],
            "next_action": token_to_str(rec[-1]),
        })
    return {"cost2go": c2g, "agents": agents}
