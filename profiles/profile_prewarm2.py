"""Pre-warm part 2: masked-rollout (ablations), argmax (A/B), and bigmap
tier programs — same cache-key trick as profile_prewarm.py."""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from mapf_gpt_tpu.envs import env as menv
from mapf_gpt_tpu.models.gpt import CONFIGS, init_params
from mapf_gpt_tpu.ops.masking import MaskConfig
from mapf_gpt_tpu.parallel.rollout import make_batch_rollout

MASKS = ("mask_actions_history", "mask_cost2go", "mask_goal",
         "mask_greed_action")


def warm(model, th, tw, slots, steps, bt, *, do_sample=True, mask=None,
         policy_batch=8192):
    cfg = CONFIGS[model]
    params_sds = jax.eval_shape(partial(init_params, cfg),
                                jax.random.PRNGKey(0))
    env_spec = menv.MapfEnvSpec(height=th, width=tw, num_agents=slots,
                                max_episode_steps=steps)
    mask_cfg = MaskConfig(**{k: k == mask for k in MASKS}) if mask else None
    run = make_batch_rollout(env_spec, cfg, do_sample=do_sample,
                             policy_batch=policy_batch, mask_cfg=mask_cfg)
    g = jax.ShapeDtypeStruct((bt, th, tw), jnp.bool_)
    st = jax.ShapeDtypeStruct((bt, slots, 2), jnp.int32)
    gl = jax.ShapeDtypeStruct((bt, slots, 1, 2), jnp.int32)
    ac = jax.ShapeDtypeStruct((bt, slots), jnp.bool_)
    states = jax.eval_shape(jax.vmap(partial(menv.reset, env_spec)),
                            g, st, gl, ac)
    key_sds = jax.eval_shape(lambda: jax.random.fold_in(
        jax.random.PRNGKey(0), 0))
    t0 = time.time()
    try:
        run.lower(params_sds, states, key_sds).compile()
        print(f"warm {model} ({th},{tw},{slots},{steps}) B={bt} "
              f"mask={mask} sample={do_sample}: {time.time() - t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"FAILED {model} ({th},{tw},{slots},{steps}) B={bt}: "
              f"{type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "masks"):
        for m in MASKS:  # 01-random A=32 tier
            warm("2M", 32, 32, 32, 128, 128, mask=m)
    if which in ("all", "argmax"):  # 03-warehouse dense tiers
        for slots, bt in ((96, 128), (128, 96), (128, 32), (160, 76),
                          (160, 56), (192, 64)):
            warm("2M", 64, 64, slots, 128, bt, do_sample=False)
    if which in ("all", "bigmap"):  # Berlin_1_256 padded 266 -> tier 288
        warm("85M", 288, 288, 256, 256, 8)
        warm("2M", 288, 288, 256, 256, 8)
    print("PREWARM2_DONE", flush=True)
