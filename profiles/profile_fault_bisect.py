"""Bisect the residual rollout device fault (VERDICT r4 ask #3).

Round-4 envelope: 2M clean through 24576 contexts, 6M crashes the tunneled
v5e worker at 12288 (clean at 8192), 85M at 2048 on a 288^2 grid.  The
policy forward is chunked at policy_batch=8192 in ALL those runs, so the
per-forward shape is identical at 8192 and 12288 total contexts — which
makes "tracks the megakernel's size" (r4 CONFORMANCE) suspicious.  This
driver decomposes the faulting shapes component-by-component, one probe per
subprocess (a crash kills the worker; the chip recovers for the next
process):

  rollout   — full fused rollout (reproduces the r4 crash condition)
  policy    — per-step policy forward alone inside the same lax.scan,
              same chunking, random tokens (no env, no tokenizer)
  obsenv    — env.step + tokenizer alone inside the scan, random actions
              (no policy)
  nochunk   — policy with policy_batch=None (one kernel call over all
              contexts) — separates chunk-count from total-context effects
  flax      — policy via the XLA layer-by-layer flax forward (no pallas
              megakernel at all); a crash here exonerates the kernel
  ctx2      — policy with MAPF_GPT_TPU_CTX=2 (smaller VMEM tile, 2x grid)
  lpc1      — policy with 1 transformer layer per pallas call (minimum
              per-call weight stack; x round-trips HBM between calls)

Usage: python profiles/profile_fault_bisect.py [--model 6M] [--out f.json]
Writes one JSON line per probe and a summary; runs on the real chip.
"""

import argparse
import json
import os
import subprocess
import sys
import time

PROBES = ("rollout", "policy", "obsenv", "nochunk", "flax", "ctx2", "lpc1")


def _build_states(model: str, envs: int, agents: int, bigmap: bool):
    import numpy as np
    import jax.numpy as jnp

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.maps import MapRegistry, sample_instance
    from mapf_gpt_tpu.parallel.rollout import batch_reset

    reg = MapRegistry()
    if bigmap:
        # stitched Berlin map, same as eval/bigmap.py gate 4
        reg.load_reference_suite("/root/reference/eval_configs/04-movingai")
        grid = reg.stitch_tiles("Berlin_1_256")
        insts = [sample_instance(grid, agents, seed=i) for i in range(envs)]
    else:
        reg.load_reference_suite("/root/reference/eval_configs/03-warehouse")
        name = [n for n in reg.names() if "warehouse" in n.lower()][0]
        insts = [sample_instance(reg[name], agents, seed=i,
                                 masks=reg.masks(name)) for i in range(envs)]
    h, w = insts[0].grid.shape
    spec = menv.MapfEnvSpec(height=h, width=w, num_agents=agents,
                            max_episode_steps=16)
    states = batch_reset(
        spec, jnp.asarray(np.stack([i.grid for i in insts])),
        jnp.asarray(np.stack([i.starts for i in insts])),
        jnp.asarray(np.stack([i.goals for i in insts]))[:, :, None, :],
        jnp.ones((envs, agents), bool))
    return spec, states


def probe_child(probe: str, model: str, envs: int, agents: int,
                bigmap: int) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from functools import partial

    from mapf_gpt_tpu.envs import env as menv
    from mapf_gpt_tpu.models.gpt import CONFIGS, init_params, make_forward
    from mapf_gpt_tpu.parallel.rollout import make_batch_rollout, _tokens_of

    cfg = CONFIGS[model]
    params = init_params(cfg, jax.random.PRNGKey(0))
    n = envs * agents

    if probe == "ctx2":
        os.environ["MAPF_GPT_TPU_CTX"] = "2"
    if probe == "lpc1":
        from mapf_gpt_tpu.ops import fused_gpt as fg

        fg.default_layers_per_call = lambda _cfg: 1

    if probe in ("policy", "nochunk", "flax", "ctx2", "lpc1"):
        # the policy path exactly as the rollout runs it: inside a scan,
        # chunked (or not), but fed synthetic tokens — no env state at all
        forward = make_forward(cfg, use_fused=(probe != "flax"))
        pb = None if probe == "nochunk" else 8192

        def policy(tokens2d):
            if pb is None or tokens2d.shape[0] <= pb:
                return forward(params, tokens2d)
            npad = -(-n // pb) * pb
            t = jnp.concatenate(
                [tokens2d, jnp.zeros((npad - n, 256), tokens2d.dtype)])
            out = jax.lax.map(lambda c: forward(params, c),
                              t.reshape(npad // pb, pb, -1))
            return out.reshape(npad, -1)[:n]

        @jax.jit
        def run(tokens):
            def body(carry, _):
                logits = policy(carry)
                nxt = (carry + logits[:, :1].astype(jnp.int32)) % 67
                return nxt, None

            out, _ = jax.lax.scan(body, tokens, None, length=16)
            return out

        tokens = jnp.asarray(
            np.random.RandomState(0).randint(0, 67, size=(n, 256)),
            dtype=jnp.int32)
        np.asarray(run(tokens))
    elif probe == "obsenv":
        spec, states = _build_states(model, envs, agents, bool(bigmap))

        @jax.jit
        def run(states, key):
            def body(carry, _):
                sts, k = carry
                tokens = jax.vmap(_tokens_of)(sts)
                k, sub = jax.random.split(k)
                acts = jax.random.randint(
                    sub, (envs, agents), 0, 5, dtype=jnp.int32)
                # consume tokens so the tokenizer isn't dead code
                acts = (acts + tokens[:, :, 0] * 0).astype(jnp.int32)
                sts = jax.vmap(partial(menv.step, spec))(sts, acts)
                return (sts, k), None

            (final, _), _ = jax.lax.scan(body, (states, key), None,
                                         length=16)
            return final

        final = run(states, jax.random.PRNGKey(1))
        np.asarray(final.pos)
    else:  # rollout
        spec, states = _build_states(model, envs, agents, bool(bigmap))
        run = make_batch_rollout(spec, CONFIGS[model], do_sample=True,
                                 policy_batch=8192)
        _, metrics = run(params, states, jax.random.PRNGKey(1))
        for leaf in jax.tree_util.tree_leaves(metrics):
            np.asarray(leaf)
    print("CHILD_OK", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="6M")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--agents", type=int, default=192)
    ap.add_argument("--bigmap", action="store_true")
    ap.add_argument("--probes", nargs="*", default=list(PROBES))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = []
    for probe in args.probes:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, __file__, "--child", probe, args.model,
             str(args.envs), str(args.agents), str(int(args.bigmap))],
            capture_output=True, text=True, timeout=1800)
        ok = "CHILD_OK" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()[-4:]
        results.append({"probe": probe, "model": args.model,
                        "envs": args.envs, "agents": args.agents,
                        "contexts": args.envs * args.agents,
                        "bigmap": args.bigmap, "ok": ok,
                        "wall_s": round(time.time() - t0, 1),
                        "tail": [] if ok else tail})
        print(json.dumps(results[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        probe_child(sys.argv[2], sys.argv[3], int(sys.argv[4]),
                    int(sys.argv[5]), int(sys.argv[6]))
    else:
        main()
