"""Golden fixed-seed episode: the whole rollout stack (env + tokenizer +
policy forward + argmax) must reproduce the committed fixture exactly
(integers) / within float tolerance (logits).  Regenerate with
``python -m tests.make_golden_episode`` after any *intentional* semantic
change, and justify the diff in the commit message."""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "episode_golden.npz")


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_rollout_matches_golden_episode():
    import jax
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.models.gpt import (CONFIGS, action_logits, init_params,
                                         make_forward)
    from mapf_gpt_tpu.ops.obs import observe

    g = np.load(FIXTURE)
    steps, agents = g["actions"].shape
    cfg = CONFIGS["2M"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    forward = make_forward(cfg, use_fused=False)

    h, w = g["grid"].shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=agents,
                            max_episode_steps=steps)
    state = menv.reset(spec, jnp.asarray(g["grid"]), jnp.asarray(g["starts"]),
                       jnp.asarray(g["goals"])[:, None, :],
                       jnp.ones((agents,), bool))
    for t in range(steps):
        toks = observe(menv.current_c2g(state), state.pos, state.goal,
                       state.hist, state.active)
        np.testing.assert_array_equal(np.asarray(toks, np.int8),
                                      g["tokens"][t], err_msg=f"tokens@{t}")
        logits = action_logits(forward(params, toks))
        np.testing.assert_allclose(np.asarray(logits), g["logits"][t],
                                   atol=5e-4, err_msg=f"logits@{t}")
        acts = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(acts, np.int8),
                                      g["actions"][t], err_msg=f"actions@{t}")
        state = menv.step(spec, state, acts)
        np.testing.assert_array_equal(np.asarray(state.pos, np.int16),
                                      g["positions"][t + 1],
                                      err_msg=f"positions@{t}")
