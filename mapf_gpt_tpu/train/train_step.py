"""Data-parallel training step: pjit + scan-based gradient accumulation.

Rebuilds the reference training semantics (ref:train.py) TPU-first:

- AdamW(0.9, 0.95), weight decay 0.1 applied to >=2D params only
  (ref:model.py:202-226), global-norm grad clip 1.0 (ref:train.py:51,333-335),
- linear warmup 2000 -> cosine decay to lr/10 (ref:train.py:263-274),
- gradient accumulation over 16 micro-batches inside ONE jitted step via
  ``lax.scan`` (ref:train.py:314-331 does a Python loop with a DDP no-sync
  toggle; under pjit the psum happens once per step by construction),
- loss: cross-entropy at the final token position only — the reference
  computes full [B,T,V] logits and masks targets==-1
  (ref:train.py:183, ref:dataset/fast_data_loader.py:34); only position 255
  ever has a target, so we compute the head there directly,
- bf16 activations (the autocast equivalent), fp32 params/optimizer.

Sharding: batch arrays carry a leading micro-batch axis [accum, B, ...]; B is
sharded over the mesh ``data`` axis, params are replicated.  XLA inserts the
gradient all-reduce over ICI automatically.  See parallel/mesh.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mapf_gpt_tpu.models.gpt import GPT, GPTConfig


class TrainConfig(NamedTuple):
    """Optimization hyperparameters (reference defaults, ref:train.py:46-56)."""

    learning_rate: float = 6e-4
    min_lr: float = 6e-5
    warmup_iters: int = 2000
    lr_decay_iters: int = 30000
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    grad_accum: int = 16


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(tc: TrainConfig):
    # clamp warmup for short runs (reference assumes max_iters >> 2000):
    # cap at 10% of the decay horizon so a 4k-iter run warms up for 400
    # iters, not half its schedule; 30k+ runs keep the reference's 2000
    warmup = min(tc.warmup_iters, max(tc.lr_decay_iters // 10, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=tc.learning_rate,
        warmup_steps=warmup, decay_steps=max(tc.lr_decay_iters, warmup + 1),
        end_value=tc.min_lr)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    def decay_mask(params):
        return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)

    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(lr_schedule(tc), b1=tc.beta1, b2=tc.beta2,
                    weight_decay=tc.weight_decay, mask=decay_mask),
    )


def init_train_state(params, tc: TrainConfig) -> TrainState:
    opt = make_optimizer(tc)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.int32(0))


def loss_fn(cfg: GPTConfig, params, tokens: jnp.ndarray,
            targets: jnp.ndarray) -> jnp.ndarray:
    """tokens: int32 [B, 256]; targets: int32 [B] (the gt action id)."""
    logits = GPT(cfg).apply(params, tokens)          # [B, vocab], fp32
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, targets).mean()


def select_loss_fn(cfg: GPTConfig, use_fused: bool | None = None):
    """Pick the fused megakernel fwd+bwd (ops/fused_gpt_train.py — ~2x
    tokens/s on v5e and no [B,H,T,T] fp32 score allocation) when the backend
    and config allow; the flax autodiff path otherwise (CPU tests, bias or
    dropout configs, sharded meshes where per-device batches are tiny)."""
    if use_fused is None:
        use_fused = (jax.default_backend() != "cpu"
                     and not cfg.bias and cfg.dropout == 0.0
                     and cfg.n_embd % cfg.n_head == 0)
    if use_fused:
        from mapf_gpt_tpu.ops.fused_gpt_train import fused_loss_fn

        return lambda p, x, y: fused_loss_fn(cfg, p, x, y)
    return lambda p, x, y: loss_fn(cfg, p, x, y)


def make_train_step(cfg: GPTConfig, tc: TrainConfig,
                    use_fused: bool | None = None):
    """Returns train_step(state, tokens, targets) -> (state, loss).

    tokens: int32 [accum, B, 256]; targets: int32 [accum, B].
    Jit with donate_argnums=(0,) and shard B over the data axis.
    """
    opt = make_optimizer(tc)
    grad_fn = jax.value_and_grad(select_loss_fn(cfg, use_fused))

    def train_step(state: TrainState, tokens, targets):
        def micro(carry, mb):
            g_acc, l_acc = carry
            x, y = mb
            loss, grads = grad_fn(state.params, x, y)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            return (g_acc, l_acc + loss), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, loss_sum), _ = jax.lax.scan(
            micro, (zeros, jnp.float32(0.0)), (tokens, targets))
        scale = 1.0 / tc.grad_accum
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, loss_sum * scale

    return train_step


def make_eval_step(cfg: GPTConfig):
    """eval_step(params, tokens [B,256], targets [B]) -> (loss, accuracy)."""

    def eval_step(params, tokens, targets):
        logits = GPT(cfg).apply(params, tokens)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets).mean()
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == targets)
                       .astype(jnp.float32))
        return loss, acc

    return eval_step
