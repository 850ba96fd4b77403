"""Regenerate tests/fixtures/episode_golden.npz — the fixed-seed golden
episode guarding the whole rollout stack (env + tokenizer + policy + argmax),
VERDICT r1 item 3b.

Run on the CPU backend so the fixture is hardware-independent:

    env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python -m tests.make_golden_episode

Scenario: 21x21 random grid (density 0.3, seed 0), 32 agents, 2M config
with seeded-init params (PRNGKey(0)), argmax policy, 16 steps.  Stored:
tokens int8 [S+1, A, 256], action logits f32 [S, A, 5], argmax actions
int8 [S, A], positions int16 [S+1, A, 2].
"""

import os

import numpy as np

STEPS = 16
AGENTS = 32
OUT = os.path.join(os.path.dirname(__file__), "fixtures",
                   "episode_golden.npz")


def generate():
    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.maps import random_grid, sample_instance
    from mapf_gpt_tpu.models.gpt import (CONFIGS, action_logits, init_params,
                                         make_forward)
    from mapf_gpt_tpu.ops.obs import observe

    cfg = CONFIGS["2M"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    forward = make_forward(cfg, use_fused=False)

    inst = sample_instance(random_grid(21, 0.3, 0), AGENTS, seed=0)
    h, w = inst.grid.shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=AGENTS,
                            max_episode_steps=STEPS)
    state = menv.reset(spec, jnp.asarray(inst.grid), jnp.asarray(inst.starts),
                       jnp.asarray(inst.goals)[:, None, :],
                       jnp.ones((AGENTS,), bool))

    tokens_l, logits_l, actions_l, pos_l = [], [], [], [np.asarray(state.pos)]
    for _ in range(STEPS):
        toks = observe(menv.current_c2g(state), state.pos, state.goal,
                       state.hist, state.active)
        logits = action_logits(forward(params, toks))
        acts = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens_l.append(np.asarray(toks, np.int8))
        logits_l.append(np.asarray(logits, np.float32))
        actions_l.append(np.asarray(acts, np.int8))
        state = menv.step(spec, state, acts)
        pos_l.append(np.asarray(state.pos))
    toks = observe(menv.current_c2g(state), state.pos, state.goal,
                   state.hist, state.active)
    tokens_l.append(np.asarray(toks, np.int8))

    np.savez_compressed(
        OUT,
        grid=inst.grid, starts=inst.starts, goals=inst.goals,
        tokens=np.stack(tokens_l), logits=np.stack(logits_l),
        actions=np.stack(actions_l),
        positions=np.stack(pos_l).astype(np.int16))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    generate()
