"""Non-causal GPT policy in flax — semantics of the reference nanoGPT encoder.

Matches ref:mapf_gpt/model.py:

- learned token + position embeddings, weight tying between the token
  embedding and the output head (ref:model.py:126-138),
- pre-LN blocks with bias-free LayerNorm (``bias=False`` default,
  ref:model.py:11-20,115), fused QKV projection, **non-causal**
  scaled-dot-product attention (ref:model.py:56-60), 4x GELU MLP,
- loss = cross-entropy at the last position only (targets are -1 everywhere
  else, ref:model.py:180-183 + ref:dataset/fast_data_loader.py:34) — here we
  compute the head only at that position, which is mathematically identical
  and avoids a [B, T, vocab] logits tensor,
- action head: logits masked to the first 5 vocab ids, categorical sample or
  argmax (ref:model.py:244-260).

TPU-first choices: bfloat16 activations with float32 params and float32
attention/softmax accumulation; einsum-based attention (T=256, d<=768 — flash
kernels are unnecessary at this sequence length, XLA fuses fine); static
shapes throughout.

Model family (ref:experiment_setup/config-{2M,6M,85M}.py):
  2M: 5L/5H/160d   6M: 8L/8H/256d   85M: 12L/12H/768d
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from mapf_gpt_tpu.ops.vocab import CONTEXT_SIZE, NUM_ACTIONS, VOCAB_SIZE


@dataclass(frozen=True)
class GPTConfig:
    block_size: int = CONTEXT_SIZE
    vocab_size: int = VOCAB_SIZE
    n_layer: int = 8
    n_head: int = 8
    n_embd: int = 256
    dropout: float = 0.0
    bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16   # activation/compute dtype
    attn_impl: str = "auto"           # "auto" | "einsum" | "pallas" (ops/attention.py)


CONFIGS = {
    "2M": GPTConfig(n_layer=5, n_head=5, n_embd=160),
    "6M": GPTConfig(n_layer=8, n_head=8, n_embd=256),
    "85M": GPTConfig(n_layer=12, n_head=12, n_embd=768),
}

# reference init: normal(0.02) for all Linear/Embedding weights
# (ref:model.py:159-165)
DENSE_INIT = nn.initializers.normal(stddev=0.02)


class SelfAttention(nn.Module):
    cfg: GPTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        b, t, c = x.shape
        nh, hd = cfg.n_head, cfg.n_embd // cfg.n_head
        qkv = nn.Dense(3 * cfg.n_embd, use_bias=cfg.bias, dtype=cfg.dtype,
                       kernel_init=DENSE_INIT, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)  # [B, H, T, D]
        k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        scale = 1.0 / math.sqrt(hd)
        if cfg.dropout > 0.0 and not deterministic:
            # training-with-dropout keeps the reference einsum path so the
            # score tensor is available to drop
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                             preferred_element_type=jnp.float32) * scale
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(cfg.dropout)(att, deterministic=False)
            y = jnp.einsum("bhqk,bhkd->bhqd", att.astype(cfg.dtype), v)
        else:
            from mapf_gpt_tpu.ops.attention import attention

            y = attention(q, k, v, scale, impl=cfg.attn_impl)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = nn.Dense(cfg.n_embd, use_bias=cfg.bias, dtype=cfg.dtype,
                     kernel_init=DENSE_INIT, name="c_proj")(y)
        if cfg.dropout > 0.0 and not deterministic:
            y = nn.Dropout(cfg.dropout)(y, deterministic=False)
        return y


class MLP(nn.Module):
    cfg: GPTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        x = nn.Dense(4 * cfg.n_embd, use_bias=cfg.bias, dtype=cfg.dtype,
                     kernel_init=DENSE_INIT, name="c_fc")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU() is the erf form
        x = nn.Dense(cfg.n_embd, use_bias=cfg.bias, dtype=cfg.dtype,
                     kernel_init=DENSE_INIT, name="c_proj")(x)
        if cfg.dropout > 0.0 and not deterministic:
            x = nn.Dropout(cfg.dropout)(x, deterministic=False)
        return x


class Block(nn.Module):
    cfg: GPTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, use_bias=cfg.bias,
                                       dtype=jnp.float32,
                                       use_fast_variance=False, name=name)
        x = x + SelfAttention(cfg, name="attn")(ln("ln_1")(x), deterministic)
        x = x + MLP(cfg, name="mlp")(ln("ln_2")(x), deterministic)
        return x


class GPT(nn.Module):
    cfg: GPTConfig

    @nn.compact
    def __call__(self, idx, deterministic: bool = True,
                 last_only: bool = True):
        """idx: int [B, T] tokens. Returns logits.

        last_only=True -> [B, vocab] logits at the final position (both the
        training loss and inference only ever read that position).
        last_only=False -> [B, T, vocab].
        """
        cfg = self.cfg
        b, t = idx.shape
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.n_embd), jnp.float32)
        wpe = self.param("wpe", nn.initializers.normal(0.02),
                         (cfg.block_size, cfg.n_embd), jnp.float32)
        x = (wte[idx] + wpe[None, :t]).astype(cfg.dtype)
        if cfg.dropout > 0.0 and not deterministic:
            x = nn.Dropout(cfg.dropout)(x, deterministic=False)
        for i in range(cfg.n_layer):
            x = Block(cfg, name=f"h_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, use_bias=cfg.bias, dtype=jnp.float32,
                         use_fast_variance=False, name="ln_f")(x)
        if last_only:
            x = x[:, -1, :]
        # weight-tied head (ref:model.py:138): logits in fp32
        logits = jnp.einsum("...d,vd->...v", x.astype(jnp.float32), wte)
        return logits

    @staticmethod
    def num_params(params, non_embedding: bool = True) -> int:
        n = sum(p.size for p in jax.tree_util.tree_leaves(params))
        if non_embedding:
            n -= params["params"]["wpe"].size
        return n


def init_params(cfg: GPTConfig, key: jax.Array):
    """Initialize parameters with the reference's init scheme:
    normal(0.02) everywhere, residual projections scaled by 1/sqrt(2L)
    (ref:model.py:141-145,159-165)."""
    model = GPT(cfg)
    dummy = jnp.zeros((1, cfg.block_size), dtype=jnp.int32)
    params = model.init(key, dummy)

    def rescale(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "c_proj" in names and names[-1] == "kernel":
            return leaf * (1.0 / jnp.sqrt(2.0 * cfg.n_layer))
        return leaf

    return jax.tree_util.tree_map_with_path(rescale, params)


def make_forward(cfg: GPTConfig, use_fused: bool | None = None):
    """Inference forward selector: forward(params, tokens [N, T]) -> logits
    [N, vocab] at the last position.

    On TPU this uses the fused whole-model pallas megakernel
    (ops/fused_gpt.py — ~2.7x the XLA layer-by-layer forward at rollout batch
    sizes); on CPU (tests, fake meshes) or for bias/dropout configs the
    kernel doesn't cover, it falls back to the flax module.
    """
    if use_fused is None:
        use_fused = (jax.default_backend() != "cpu"
                     and not cfg.bias and cfg.dropout == 0.0
                     and cfg.n_embd % cfg.n_head == 0)
    if use_fused:
        from mapf_gpt_tpu.ops.fused_gpt import fused_logits

        return lambda params, tokens: fused_logits(params, tokens, cfg)
    model = GPT(cfg)
    return lambda params, tokens: model.apply(params, tokens)


def action_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Mask to the 5 action ids (ref:model.py:249-252)."""
    return logits[..., :NUM_ACTIONS]


def act(logits: jnp.ndarray, key: jax.Array | None = None,
        do_sample: bool = True) -> jnp.ndarray:
    """Sample (or argmax) actions from last-position logits [B, vocab].

    The reference samples via a seeded torch generator
    (ref:mapf_gpt/inference.py:69-70, ref:model.py:254-259); torch's
    multinomial stream is not bit-reproducible here, so sampling uses JAX
    counter-based PRNG while argmax is exactly equivalent.
    """
    al = action_logits(logits)
    if do_sample:
        assert key is not None
        return jax.random.categorical(key, al, axis=-1)
    return jnp.argmax(al, axis=-1)
