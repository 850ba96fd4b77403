import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapf_gpt_tpu.models import convert
from mapf_gpt_tpu.models.gpt import CONFIGS, GPT, GPTConfig, act, init_params

REF = "/root/reference"


def _load_reference_gpt():
    """Import the reference torch model as a parity oracle (not vendored)."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not available")
    if "loguru" not in sys.modules:  # reference imports loguru for logging only
        stub = types.ModuleType("loguru")
        stub.logger = types.SimpleNamespace(
            warning=lambda *a, **k: None, debug=lambda *a, **k: None,
            info=lambda *a, **k: None)
        sys.modules["loguru"] = stub
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_model", os.path.join(REF, "mapf_gpt", "model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_param_count_2m():
    cfg = CONFIGS["2M"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    n = GPT.num_params(params)
    assert 1.5e6 < n < 2.5e6


def test_state_dict_round_trip():
    cfg = GPTConfig(n_layer=2, n_head=2, n_embd=32)
    params = init_params(cfg, jax.random.PRNGKey(1))
    sd = convert.params_to_torch_state_dict(params, cfg)
    back = convert.torch_state_dict_to_params(sd, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=0),
        params, back)


def test_logits_parity_with_reference_torch():
    import torch

    ref = _load_reference_gpt()
    cfg = GPTConfig(n_layer=3, n_head=4, n_embd=64, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(2))

    # build the reference torch model with identical weights
    tcfg = ref.GPTConfig(block_size=cfg.block_size, vocab_size=cfg.vocab_size,
                         n_layer=cfg.n_layer, n_head=cfg.n_head,
                         n_embd=cfg.n_embd, dropout=0.0, bias=False)
    tmodel = ref.GPT(tcfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in convert.params_to_torch_state_dict(params, cfg).items()}
    tmodel.load_state_dict(sd, strict=False)
    tmodel.eval()

    rng = np.random.RandomState(0)
    idx = rng.randint(0, cfg.vocab_size, size=(4, cfg.block_size))
    with torch.no_grad():
        tlogits, _ = tmodel(torch.from_numpy(idx).long())
    tlogits = tlogits[:, -1, :].numpy()

    jlogits = np.asarray(GPT(cfg).apply(params, jnp.asarray(idx)))
    # XLA's erf (GELU) rational approximation differs from libm's at ~1e-7
    # per element; through 4x-hidden MLPs this accumulates to ~1e-3 on logits.
    np.testing.assert_allclose(jlogits, tlogits, rtol=0, atol=5e-3)

    # argmax action parity (ref act with do_sample=False)
    with torch.no_grad():
        tact = tmodel.act(torch.from_numpy(idx).long(), do_sample=False).numpy()
    jact = np.asarray(act(jnp.asarray(jlogits), do_sample=False))
    np.testing.assert_array_equal(jact, tact)


def test_bf16_close_to_fp32():
    cfg32 = GPTConfig(n_layer=2, n_head=2, n_embd=64, dtype=jnp.float32)
    cfg16 = GPTConfig(n_layer=2, n_head=2, n_embd=64, dtype=jnp.bfloat16)
    params = init_params(cfg32, jax.random.PRNGKey(3))
    idx = jnp.asarray(np.random.RandomState(1).randint(0, 67, size=(2, 256)))
    l32 = GPT(cfg32).apply(params, idx)
    l16 = GPT(cfg16).apply(params, idx)
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32), atol=0.15)
