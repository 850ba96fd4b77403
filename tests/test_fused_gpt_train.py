"""Gradient parity for the fused training megakernels (ops/fused_gpt_train.py)
against the flax autodiff path (train/train_step.loss_fn), interpret mode on
CPU.  Tolerances account for bf16 activations and the tanh-GELU approximation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapf_gpt_tpu.models.gpt import CONFIGS, GPTConfig, init_params
from mapf_gpt_tpu.ops.fused_gpt_train import fused_loss_fn
from mapf_gpt_tpu.train.train_step import loss_fn


def _setup(cfg, n, key=0):
    params = init_params(cfg, jax.random.PRNGKey(key))
    rng = np.random.RandomState(key)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (n, cfg.block_size)),
                         jnp.int32)
    targets = jnp.asarray(rng.randint(0, 5, (n,)), jnp.int32)
    return params, tokens, targets


def _grad_compare(cfg, n, atol_scale=0.08, key=0):
    params, tokens, targets = _setup(cfg, n, key)
    ref_loss, ref_g = jax.value_and_grad(
        lambda p: loss_fn(cfg, p, tokens, targets))(params)
    got_loss, got_g = jax.value_and_grad(
        lambda p: fused_loss_fn(cfg, p, tokens, targets, interpret=True)
    )(params)
    assert abs(float(ref_loss) - float(got_loss)) < 0.03, (
        float(ref_loss), float(got_loss))
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(got_g)}
    for k, rv in flat_ref:
        ks = jax.tree_util.keystr(k)
        gv = flat_got[ks]
        rv, gv = np.asarray(rv, np.float32), np.asarray(gv, np.float32)
        scale = np.abs(rv).max() + 1e-5
        err = np.abs(rv - gv).max()
        assert err <= atol_scale * scale + 1e-4, (ks, err, scale)


def test_small_config_grads():
    cfg = GPTConfig(n_layer=2, n_head=2, n_embd=64, block_size=64)
    _grad_compare(cfg, n=16)


def test_2m_config_grads():
    _grad_compare(CONFIGS["2M"], n=8, key=1)


def test_padding_path_loss():
    cfg = GPTConfig(n_layer=1, n_head=2, n_embd=64, block_size=64)
    params, tokens, targets = _setup(cfg, 10, key=2)  # 10 % 8 != 0
    ref = float(loss_fn(cfg, params, tokens, targets))
    got = float(fused_loss_fn(cfg, params, tokens, targets, interpret=True))
    assert abs(ref - got) < 0.03


def test_one_sgd_step_decreases_loss():
    """End-to-end sanity: a few SGD steps on a fixed batch reduce the fused
    loss (the gradients point downhill)."""
    cfg = GPTConfig(n_layer=2, n_head=2, n_embd=64, block_size=64)
    params, tokens, targets = _setup(cfg, 32, key=3)
    lfn = lambda p: fused_loss_fn(cfg, p, tokens, targets, interpret=True)
    l0 = float(lfn(params))
    for _ in range(5):
        g = jax.grad(lfn)(params)
        params = jax.tree_util.tree_map(
            lambda p, gg: p - 0.1 * gg.astype(p.dtype), params, g)
    l1 = float(lfn(params))
    assert l1 < l0 - 0.5, (l0, l1)


def test_chunked_layers_grads(monkeypatch):
    """Force the 85M-style layer-chunked fwd/bwd walk on a small model and
    check gradient parity (the wide-model path, VMEM-sized chunks)."""
    from mapf_gpt_tpu.ops import fused_gpt_train as fgt

    monkeypatch.setattr(fgt, "_fwd_layers_per_call", lambda cfg: 1)
    monkeypatch.setattr(fgt, "_bwd_layers_per_call", lambda cfg: 1)
    cfg = GPTConfig(n_layer=3, n_head=2, n_embd=64, block_size=64)
    _grad_compare(cfg, n=16)
