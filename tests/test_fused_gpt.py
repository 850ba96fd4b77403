"""Parity tests for the fused whole-GPT megakernel (ops/fused_gpt.py).

Runs the pallas kernel in interpret mode on CPU and compares against the
flax layer-by-layer forward (models/gpt.py), which itself is parity-tested
against the reference torch module in test_model.py.  Tolerances cover the
kernel's two documented approximations (tanh GELU, bf16 unnormalized
softmax), both below bf16 activation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapf_gpt_tpu.models.gpt import CONFIGS, GPT, GPTConfig, init_params
from mapf_gpt_tpu.ops.fused_gpt import (default_layers_per_call,
                                        fused_logits)


def _compare(cfg, n, key=0, **kw):
    params = init_params(cfg, jax.random.PRNGKey(key))
    tokens = jnp.asarray(
        np.random.RandomState(key).randint(0, cfg.vocab_size,
                                           size=(n, cfg.block_size)),
        dtype=jnp.int32)
    ref = np.asarray(GPT(cfg).apply(params, tokens))
    got = np.asarray(fused_logits(params, tokens, cfg, interpret=True, **kw))
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got, ref, atol=0.02 * scale + 0.02)
    return ref, got


def test_small_config_matches_flax():
    cfg = GPTConfig(n_layer=2, n_head=2, n_embd=64, block_size=64)
    _compare(cfg, n=16, ctx_per_program=8)


def test_2m_config_matches_flax():
    _compare(CONFIGS["2M"], n=8)


def test_batch_padding():
    cfg = GPTConfig(n_layer=1, n_head=2, n_embd=64, block_size=64)
    # n=10 not divisible by ctx_per_program=8 -> pad path
    ref, got = _compare(cfg, n=10, ctx_per_program=8)
    assert got.shape[0] == 10


def test_layer_chunking_matches_single_call():
    cfg = GPTConfig(n_layer=4, n_head=2, n_embd=64, block_size=64)
    params = init_params(cfg, jax.random.PRNGKey(3))
    tokens = jnp.asarray(
        np.random.RandomState(3).randint(0, cfg.vocab_size, size=(8, 64)),
        dtype=jnp.int32)
    one = np.asarray(fused_logits(params, tokens, cfg, interpret=True,
                                  layers_per_call=4))
    chunked = np.asarray(fused_logits(params, tokens, cfg, interpret=True,
                                      layers_per_call=2))
    # bf16 activations: differences are XLA reassociation noise at bf16 eps
    np.testing.assert_allclose(one, chunked, atol=5e-3)


def test_argmax_action_agreement_with_flax():
    """What matters downstream is the argmax over the 5 action logits;
    check near-total agreement on a real-size config."""
    cfg = CONFIGS["2M"]
    params = init_params(cfg, jax.random.PRNGKey(1))
    tokens = jnp.asarray(
        np.random.RandomState(1).randint(0, cfg.vocab_size, size=(16, 256)),
        dtype=jnp.int32)
    ref = np.asarray(GPT(cfg).apply(params, tokens))[:, :5].argmax(-1)
    got = np.asarray(fused_logits(params, tokens, cfg,
                                  interpret=True))[:, :5].argmax(-1)
    assert (ref == got).mean() >= 0.95


def test_85m_uses_layer_chunking():
    assert default_layers_per_call(CONFIGS["85M"]) < CONFIGS["85M"].n_layer
    assert default_layers_per_call(CONFIGS["2M"]) == CONFIGS["2M"].n_layer
    assert default_layers_per_call(CONFIGS["6M"]) == CONFIGS["6M"].n_layer
