"""Fused rollout harness: env -> tokens -> policy -> sample -> step, on-device.

The reference's per-step pipeline crosses three boundaries — Python env loop,
pybind C++ tokenizer, host->GPU tensor copy (ref:mapf_gpt/inference.py:87-172,
SURVEY §3.5).  Here the whole loop is one jitted ``lax.scan``: a batch of env
instances advances ``max_episode_steps`` with zero host interaction, and only
final metrics come back.

- :func:`replay_rollout` — single instance, replays a fixed commanded-action
  sequence, returning per-step positions + token contexts (parity tests).
- :func:`make_batch_rollout` — B instances under ``vmap``; the policy forward
  runs once per step over all B*A agent contexts (the reference's cross-env
  agent batching, ref:inference.py:151-172, without the host round-trip).

Sharding across a mesh is layered on top in parallel/mesh.py (env batch on the
``data`` axis, params replicated).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from mapf_gpt_tpu.envs import env as menv
from mapf_gpt_tpu.envs.metrics import EpisodeMetrics, episode_metrics
from mapf_gpt_tpu.models.gpt import GPTConfig, act, make_forward
from mapf_gpt_tpu.ops.masking import MaskConfig, apply_masks
from mapf_gpt_tpu.ops.obs import observe


def _tokens_of(state: menv.EnvState,
               mask_cfg: MaskConfig | None = None) -> jnp.ndarray:
    c2g = menv.current_c2g(state)
    tokens = observe(c2g, state.pos, state.goal, state.hist, state.active)
    if mask_cfg is not None and mask_cfg.any:
        # input-ablation switches, applied right after tokenization — the
        # reference's mask_* inference options (ref:mapf_gpt/inference.py:23-26
        # -> ref:dataset/tokenizer/tokenizer.py:104-138)
        tokens = apply_masks(tokens, mask_cfg)
    return tokens


@partial(jax.jit, static_argnums=0)
def replay_rollout(spec: menv.MapfEnvSpec, state: menv.EnvState,
                   actions_seq: jnp.ndarray):
    """Replay commanded actions through one env instance.

    actions_seq: int32 [S, A].  Returns (positions [S+1, A, 2],
    tokens [S+1, A, 256]) — index 0 is the post-reset state, matching the
    reference's create_agents + update_agents(-1) flow
    (ref:mapf_gpt/inference.py:133-145).
    """

    def body(st, acts):
        out = (st.pos, _tokens_of(st))
        return menv.step(spec, st, acts), out

    final, (positions, tokens) = jax.lax.scan(body, state, actions_seq)
    positions = jnp.concatenate([positions, final.pos[None]], axis=0)
    tokens = jnp.concatenate([tokens, _tokens_of(final)[None]], axis=0)
    return positions, tokens


def make_batch_rollout(spec: menv.MapfEnvSpec, cfg: GPTConfig,
                       do_sample: bool = True,
                       policy_batch: int | None = None,
                       mask_cfg: MaskConfig | None = None) -> Callable:
    """Build a jitted full-episode runner over a batch of env instances.

    Returns run(params, states, key) -> (final_states, EpisodeMetrics) where
    every array in `states` has a leading batch dim B.  The policy forward
    processes all B*A contexts per step (optionally in `policy_batch` chunks
    to bound memory for large models — the analogue of the reference's
    batch_size=2048 chunking, ref:inference.py:87-101).
    """
    forward = make_forward(cfg)

    def policy(params, tokens2d):
        if policy_batch is None or tokens2d.shape[0] <= policy_batch:
            return forward(params, tokens2d)
        # microbatch the forward to bound VMEM/HBM at large env x agent
        # products (the reference's batch_size=2048 chunking,
        # ref:inference.py:87-101); pad to a chunk multiple so any context
        # count works
        n = tokens2d.shape[0]
        n_pad = -(-n // policy_batch) * policy_batch
        if n_pad > n:
            tokens2d = jnp.concatenate(
                [tokens2d, jnp.zeros((n_pad - n, tokens2d.shape[1]),
                                     tokens2d.dtype)], axis=0)
        chunks = tokens2d.reshape(n_pad // policy_batch, policy_batch, -1)
        out = jax.lax.map(lambda c: forward(params, c), chunks)
        return out.reshape(n_pad, -1)[:n]

    @jax.jit
    def run(params, states, key):
        b = states.pos.shape[0]
        a = states.pos.shape[1]

        def step_once(carry, _):
            sts, k = carry
            tokens = jax.vmap(
                partial(_tokens_of, mask_cfg=mask_cfg))(sts)  # [B, A, 256]
            logits = policy(params, tokens.reshape(b * a, -1))
            k, sub = jax.random.split(k)
            actions = act(logits, sub, do_sample=do_sample)
            sts = jax.vmap(partial(menv.step, spec))(
                sts, actions.reshape(b, a).astype(jnp.int32))
            return (sts, k), None

        (final, _), _ = jax.lax.scan(step_once, (states, key), None,
                                     length=spec.max_episode_steps)
        return final, jax.vmap(episode_metrics)(final)

    return run


def batch_reset(spec: menv.MapfEnvSpec, grids, starts, goals_queues, actives):
    """vmapped reset over stacked instance arrays."""
    return jax.jit(jax.vmap(partial(menv.reset, spec)))(
        grids, starts, goals_queues, actives)


def make_recorded_rollout(spec: menv.MapfEnvSpec, cfg: GPTConfig,
                          do_sample: bool = True,
                          mask_cfg: MaskConfig | None = None) -> Callable:
    """Single-instance episode runner that also records the trajectory.

    Returns run(params, state, key) -> (final_state, metrics,
    positions [T+1, A, 2]) for animation export (eval/animation.py) and
    trajectory-parity tests.
    """
    forward = make_forward(cfg)

    @jax.jit
    def run(params, state, key):
        def step_once(carry, _):
            st, k = carry
            logits = forward(params, _tokens_of(st, mask_cfg=mask_cfg))
            k, sub = jax.random.split(k)
            actions = act(logits, sub, do_sample=do_sample)
            st2 = menv.step(spec, st, actions.astype(jnp.int32))
            return (st2, k), st2.pos

        (final, _), traj = jax.lax.scan(step_once, (state, key), None,
                                        length=spec.max_episode_steps)
        positions = jnp.concatenate([state.pos[None], traj], axis=0)
        return final, episode_metrics(final), positions

    return run
