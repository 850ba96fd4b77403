"""Round-5 roofline for the 6M training step (VERDICT r4 weak #4).

6M trains at 26.5 % MFU through the same fused path that gives 85M 54 %.
Measure where the step time goes at the 6M shape (E=256, dh=32, batch 2048,
accum 1) before burning the 30k-iter schedule at the bad rate:

  a. embedding gather + pad               (suspect: scalar gather, r4 lesson)
  b. fused fwd kernel only
  c. full fwd loss
  d. value_and_grad (fwd+bwd)
  e. full train step (grad + AdamW)
  f. (d) again with ctx_per_program in {2, 4, 8}

Usage: python profiles/profile_6m_mfu.py [--batch 2048]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mapf_gpt_tpu.models.gpt import GPT, CONFIGS
from mapf_gpt_tpu.ops import fused_gpt_train as fgt
from mapf_gpt_tpu.train import train_step as ts
from mapf_gpt_tpu.utils.profiling import chip_peak_flops


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--model", default="6M")
    args = ap.parse_args()

    cfg = CONFIGS[args.model]
    rng = jax.random.PRNGKey(0)
    params = GPT(cfg).init(rng, jnp.zeros((2, 256), jnp.int32))
    params = jax.device_put(params)
    tokens = jax.device_put(
        np.random.RandomState(0).randint(0, cfg.vocab_size,
                                         size=(args.batch, 256))
        .astype(np.int32))
    targets = jax.device_put(
        np.random.RandomState(1).randint(0, 5, size=(args.batch,))
        .astype(np.int32))

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    toks = args.batch * 256
    # PaLM-style: fwd 2N, bwd 4N per token + attention term
    att = 2 * 2 * 2 * cfg.n_layer * 256 * cfg.n_embd
    fwd_flops = (2 * n_params + att // 3) * toks
    step_flops = (6 * n_params + att) * toks
    peak = chip_peak_flops()

    p = params["params"]

    @jax.jit
    def embed(tk):
        return (p["wte"][tk] + p["wpe"][None, :256]).astype(jnp.bfloat16)

    t_embed = timeit(embed, tokens)
    print(f"a. embedding gather:      {t_embed*1e3:8.2f} ms")

    x0 = embed(tokens)
    stacks = fgt.build_train_stacks(params, cfg)
    for ctx in (2, 4, 8):
        if args.batch % ctx:
            continue
        fwd = jax.jit(functools.partial(
            fgt.fused_blocks_train, cfg=cfg, ctx=ctx, interpret=False))
        try:
            t_fwd = timeit(fwd, stacks, x0)
        except Exception as e:  # noqa: BLE001 — report and continue probing
            print(f"b. fwd kernel ctx={ctx}:   FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        print(f"b. fwd kernel ctx={ctx}:     {t_fwd*1e3:8.2f} ms  "
              f"(fwd MFU {fwd_flops/t_fwd/peak*100:5.1f}%)")

    loss = jax.jit(functools.partial(fgt.fused_loss_fn, cfg))
    t_loss = timeit(loss, params, tokens, targets)
    print(f"c. full fwd loss:         {t_loss*1e3:8.2f} ms  "
          f"(fwd MFU {fwd_flops/t_loss/peak*100:5.1f}%)")

    for ctx in (2, 4, 8):
        if args.batch % ctx:
            continue
        vg = jax.jit(jax.value_and_grad(functools.partial(
            fgt.fused_loss_fn, cfg, ctx_per_program=ctx)))
        try:
            t_vg = timeit(vg, params, tokens, targets)
        except Exception as e:  # noqa: BLE001
            print(f"d. grad ctx={ctx}:         FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        print(f"d. value_and_grad ctx={ctx}: {t_vg*1e3:8.2f} ms  "
              f"(MFU {step_flops/t_vg/peak*100:5.1f}%)")

    tc = ts.TrainConfig(grad_accum=1)
    step = jax.jit(ts.make_train_step(cfg, tc), donate_argnums=(0,))
    state = ts.init_train_state(params, tc)
    tk1 = tokens[None]
    tg1 = targets[None]
    state, _ = step(state, tk1, tg1)  # warmup/donate
    t0 = time.perf_counter()
    for _ in range(10):
        state, loss_v = step(state, tk1, tg1)
    jax.block_until_ready(loss_v)
    t_step = (time.perf_counter() - t0) / 10
    print(f"e. full train step:       {t_step*1e3:8.2f} ms  "
          f"(MFU {step_flops/t_step/peak*100:5.1f}%)  "
          f"{1/t_step:.2f} it/s")


if __name__ == "__main__":
    main()
