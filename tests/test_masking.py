import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mapf_gpt_tpu.ops import vocab as V
from mapf_gpt_tpu.ops.masking import MaskConfig, apply_masks, decode_context

REF = "/root/reference"


def _load_reference_tokenizer():
    """Import the reference pure-python Tokenizer as an oracle."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo unavailable")
    pdir = os.path.join(REF, "dataset", "tokenizer")
    spec_p = importlib.util.spec_from_file_location(
        "dataset.tokenizer.parameters", os.path.join(pdir, "parameters.py"))
    params = importlib.util.module_from_spec(spec_p)
    spec_p.loader.exec_module(params)
    sys.modules["dataset.tokenizer.parameters"] = params
    spec_t = importlib.util.spec_from_file_location(
        "ref_tokenizer", os.path.join(pdir, "tokenizer.py"))
    tok = importlib.util.module_from_spec(spec_t)
    spec_t.loader.exec_module(tok)
    return tok, params


@pytest.mark.parametrize("flags", [
    dict(mask_actions_history=True),
    dict(mask_cost2go=True),
    dict(mask_goal=True),
    dict(mask_greed_action=True),
    dict(mask_actions_history=True, mask_cost2go=True, mask_goal=True,
         mask_greed_action=True),
])
def test_masks_match_reference(flags):
    tok_mod, params_mod = _load_reference_tokenizer()
    enc = tok_mod.Encoder(params_mod.InputParameters(**flags))
    rng = np.random.RandomState(0)
    # a plausible context: cost2go ids, agent records, tail padding
    ctx = np.empty(256, dtype=np.int64)
    ctx[:121] = rng.randint(0, 44, size=121)
    for k in range(13):
        b = 121 + k * 10
        ctx[b:b + 2] = rng.randint(15, 26, size=2)
        ctx[b + 2:b + 4] = rng.randint(0, 41, size=2)
        ctx[b + 4:b + 9] = rng.randint(44, 50, size=5)
        ctx[b + 9] = rng.randint(50, 66)
    ctx[251:] = 66
    expected = np.asarray(enc.mask(list(ctx.copy())))
    got = np.asarray(apply_masks(jnp.asarray(ctx), MaskConfig(**flags)))
    np.testing.assert_array_equal(got, expected)


def test_vocab_matches_reference():
    tok_mod, params_mod = _load_reference_tokenizer()
    enc = tok_mod.Encoder(params_mod.InputParameters())
    assert len(enc.vocab) == V.VOCAB_SIZE
    assert enc.vocab[0] == V.ID_COORD_ZERO
    assert enc.vocab[-80] == V.ID_UNREACHABLE
    assert enc.vocab[-40] == V.ID_FAR_NEG
    assert enc.vocab[40] == V.ID_FAR_POS
    assert enc.vocab["n"] == V.ID_ACTION_BASE
    assert enc.vocab["r"] == V.ID_ACTION_BASE + 5
    assert enc.vocab["0000"] == V.ID_NEXT_ACTION_BASE
    assert enc.vocab["1111"] == V.ID_NEXT_ACTION_BASE + 15
    assert enc.vocab["!"] == V.ID_PAD


def test_decode_context_round_trip():
    ctx = np.full(256, V.ID_PAD, dtype=np.int64)
    ctx[:121] = V.ID_COORD_ZERO
    b = 121
    ctx[b:b + 4] = [V.ID_COORD_ZERO, V.ID_COORD_ZERO + 1,
                    V.ID_COORD_ZERO - 3, V.ID_COORD_ZERO + 5]
    ctx[b + 4:b + 9] = V.ID_ACTION_BASE  # 'n' x5
    ctx[b + 9] = V.ID_NEXT_ACTION_BASE + 0b1010
    out = decode_context(ctx)
    assert len(out["agents"]) == 1
    ag = out["agents"][0]
    assert ag["relative_pos"] == (0, 1)
    assert ag["relative_goal"] == (-3, 5)
    assert ag["previous_actions"] == ["n"] * 5
    assert ag["next_action"] == "1010"
