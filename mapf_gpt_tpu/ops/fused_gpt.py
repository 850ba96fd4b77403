"""Fused whole-GPT forward: one pallas megakernel, activations resident in VMEM.

Why this exists.  The policy forward is the entire rollout cost (tokenizer and
env step are <1 ms/step; see parallel/rollout.py), and at rollout batch sizes
the layer-by-layer XLA forward is **HBM-bandwidth-bound**: every LayerNorm,
residual add, softmax and GELU round-trips the [B*A*256, n_embd] activation
tensor (and the [B*A*heads, 256, 256] fp32 score tensor) through HBM.
Measured on TPU v5e at the 2M rollout shape (8192 contexts x 256 tokens),
elementwise ops run at the ~500 GB/s copy rate regardless of the op — relu
costs the same as erf — so the flax forward spends ~80 % of its 480 ms in
memory traffic, not FLOPs.

The fix is a megakernel: all transformer-block weights live in VMEM for the
whole call (2M: 3.2 MB, 6M: 12.6 MB bf16 — far under the ~128 MB VMEM), the
grid tiles the batch into groups of `ctx_per_program` contexts, and each
program runs *every* layer — LN -> QKV -> per-head attention -> proj ->
residual -> LN -> MLP -> residual — with the activation tile never leaving
VMEM.  HBM traffic collapses to: embedding tile in, last-position activations
out.  Measured: 2M forward 482 ms (flax/XLA) -> 178 ms fused on v5e.

Kernel-level choices (vs the reference torch module, ref:mapf_gpt/model.py):

- attention scale and log2(e) are folded into the Q weight columns at stacking
  time, so softmax uses `exp2` with no per-score multiply
  (mathematically identical to ref:model.py:56-60 softmax up to bf16 rounding),
- softmax normalization is deferred until after the P@V matmul: divide the
  [T, head_dim] output instead of the [T, T] probabilities (exact same value:
  (e/sum)@V == (e@V)/sum), with a +100 exp2 clamp purely as an overflow guard,
- GELU uses the tanh approximation (max abs deviation ~3e-3, below bf16
  activation noise; Mosaic has no erf/erfc lowering) — the flax path
  (models/gpt.py) keeps exact erf GELU,
- LayerNorms compute in fp32 with the reference's two-pass variance
  (ref:model.py:11-20 F.layer_norm semantics),
- weights without biases only (the reference trains with bias=False,
  ref:train.py:44); callers fall back to the flax path otherwise.

For models whose stacked weights exceed the VMEM budget (85M: 170 MB), the
wrapper runs the kernel in chunks of `layers_per_call` layers, round-tripping
x through HBM between chunks — still fused within each chunk.

Training keeps the flax path (this kernel defines no VJP); use
`models.gpt.make_forward` to auto-select per backend.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = float(np.log2(np.e))
_EPS = 1e-5
# exp2 argument clamp: pure overflow guard (bf16 max ~2^127). Scores this
# large only occur on degenerate inputs; relative softmax weights above the
# clamp are already collapsed to 1.
_EXP2_CLAMP = 100.0


def _ln_f32(x_f32: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    xc = x_f32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + _EPS)) * gain


def _run_layers(x, wqkv_ref, wproj_ref, wfc_ref, wfc2_ref, g1_ref, g2_ref,
                qkv_s, att_s, *, layers: int, heads: int, ctx: int, t: int,
                e: int, last_only: bool):
    """Transformer stack on x [ctx*t, e] bf16.  Returns the full stream
    [ctx*t, e], or — when last_only — the thinned final-layer tail
    [ctx*tl, e] with tl = min(8, t) (caller reads row tl-1 per context)."""
    dh = e // heads
    for l in range(layers):
        if last_only and l == layers - 1:
            # ---- thinned final layer: the caller only reads position t-1,
            # and earlier layers are the only consumers of the other
            # positions — so compute K/V over all positions but Q, attention,
            # projection and MLP for the last TL positions of each context
            # only (TL=8, one sublane tile: Mosaic can't relayout unit-dim
            # shape casts, and an 8-row tail costs the same as a 1-row one).
            # Saves ~1/L of the kernel's dense work (2M: 5 layers -> ~20 %).
            tl = min(8, t)
            xn = _ln_f32(x.astype(jnp.float32),
                         g1_ref[l][None, :]).astype(jnp.bfloat16)
            kv = jnp.dot(xn, wqkv_ref[l][:, e:],
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)              # [ctx*t, 2e]
            xl = x.reshape(ctx, t, e)[:, t - tl:, :].reshape(ctx * tl, e)
            qn = xn.reshape(ctx, t, e)[:, t - tl:, :].reshape(ctx * tl, e)
            q = jnp.dot(qn, wqkv_ref[l][:, :e],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)               # [ctx*tl, e]
            att = []
            for h in range(heads):
                qh = q[:, h * dh:(h + 1) * dh].reshape(ctx, tl, dh)
                kh = kv[:, h * dh:(h + 1) * dh].reshape(ctx, t, dh)
                vh = kv[:, e + h * dh:e + (h + 1) * dh].reshape(ctx, t, dh)
                s2 = jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # [ctx, tl, t]
                ex = jnp.exp2(jnp.minimum(s2, _EXP2_CLAMP)
                              ).astype(jnp.bfloat16)
                denom = jnp.sum(ex.astype(jnp.float32), axis=-1,
                                keepdims=True)
                a = jax.lax.dot_general(
                    ex, vh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # [ctx, tl, dh]
                att.append((a * (1.0 / denom)
                            ).reshape(ctx * tl, dh).astype(jnp.bfloat16))
            xl = xl + jnp.dot(jnp.concatenate(att, axis=-1), wproj_ref[l],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
            xn2 = _ln_f32(xl.astype(jnp.float32),
                          g2_ref[l][None, :]).astype(jnp.bfloat16)
            hmid = jnp.dot(xn2, wfc_ref[l],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            hact = jax.nn.gelu(hmid, approximate=True)
            xl = xl + jnp.dot(hact, wfc2_ref[l],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
            return xl
        xn = _ln_f32(x.astype(jnp.float32),
                     g1_ref[l][None, :]).astype(jnp.bfloat16)
        qkv_s[...] = jnp.dot(xn, wqkv_ref[l],
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)

        # attention batched over the ctx tile per head (measured 16% faster
        # than a fori_loop over contexts with per-context matmuls: fewer
        # instruction issues, better MXU pipelining; output bit-identical)
        for h in range(heads):
            q = qkv_s[:, h * dh:(h + 1) * dh].reshape(ctx, t, dh)
            k = qkv_s[:, e + h * dh:e + (h + 1) * dh].reshape(ctx, t, dh)
            v = qkv_s[:, 2 * e + h * dh:2 * e + (h + 1) * dh
                      ].reshape(ctx, t, dh)
            # scores already in the exp2 domain (scale folded into W_q)
            s2 = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            ex = jnp.exp2(jnp.minimum(s2, _EXP2_CLAMP)).astype(jnp.bfloat16)
            denom = jnp.sum(ex.astype(jnp.float32), axis=-1, keepdims=True)
            a = jax.lax.dot_general(ex, v, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            att_s[:, h * dh:(h + 1) * dh] = (
                a * (1.0 / denom)).reshape(ctx * t, dh).astype(jnp.bfloat16)
        x = x + jnp.dot(att_s[...], wproj_ref[l],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        xn2 = _ln_f32(x.astype(jnp.float32),
                      g2_ref[l][None, :]).astype(jnp.bfloat16)
        hmid = jnp.dot(xn2, wfc_ref[l],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
        hact = jax.nn.gelu(hmid, approximate=True)
        x = x + jnp.dot(hact, wfc2_ref[l],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
    return x


def _block_kernel(x_ref, wqkv_ref, wproj_ref, wfc_ref, wfc2_ref,
                  g1_ref, g2_ref, o_ref, qkv_s, att_s, *,
                  layers: int, heads: int, ctx: int, t: int, e: int,
                  last_only: bool):
    x = x_ref[...].reshape(ctx * t, e)
    out = _run_layers(x, wqkv_ref, wproj_ref, wfc_ref, wfc2_ref, g1_ref,
                      g2_ref, qkv_s, att_s, layers=layers, heads=heads,
                      ctx=ctx, t=t, e=e, last_only=last_only)
    if last_only:
        tl = min(8, t)
        o_ref[...] = out.reshape(ctx, tl, e)[:, tl - 1:tl, :]
    else:
        o_ref[...] = out.reshape(ctx, t, e)


def _e2e_kernel(tok_ref, wte_ref, wpet_ref, wht_ref, wqkv_ref, wproj_ref,
                wfc_ref, wfc2_ref, g1_ref, g2_ref, gf_ref, o_ref, qkv_s,
                att_s, *, layers: int, heads: int, ctx: int, t: int, e: int,
                vpad: int):
    """tokens [ctx, t, 1] int32 -> last-position logits [ctx, tl, vpad] f32
    (caller reads row tl-1; columns >= vocab are zero-weight padding).

    Folds the embedding gather (as a one-hot matmul against the VMEM-resident
    wte — the XLA gather round-trips the [N, T, E] embedded activations
    through HBM) and the final LayerNorm + tied head matmul into the same
    program as the transformer stack.  Mosaic cannot relayout lane<->sublane
    shape casts, so tokens arrive with a unit lane dim (one-hot compare is a
    lane *broadcast*), the ctx-tiled wpe and the padded transposed head
    weights are precomputed by the wrapper."""
    vocab = wte_ref.shape[0]
    toks = tok_ref[...].reshape(ctx * t, 1)
    oh = (toks == jax.lax.broadcasted_iota(
        jnp.int32, (ctx * t, vocab), 1)).astype(jnp.bfloat16)
    x = (jnp.dot(oh, wte_ref[...], preferred_element_type=jnp.float32)
         + wpet_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
    xl = _run_layers(x, wqkv_ref, wproj_ref, wfc_ref, wfc2_ref, g1_ref,
                     g2_ref, qkv_s, att_s, layers=layers, heads=heads,
                     ctx=ctx, t=t, e=e, last_only=True)   # [ctx*tl, e]
    tl = min(8, t)
    xf = _ln_f32(xl.astype(jnp.float32), gf_ref[...][None, :])
    logits = jnp.dot(xf, wht_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = logits.reshape(ctx, tl, vpad)


def stack_block_weights(params: Any, cfg) -> dict:
    """Stack per-layer flax params into the kernel's layout.

    Returns bf16 [L, ...] weight stacks with the attention scale and log2(e)
    pre-folded into the W_q columns, plus fp32 LN gain stacks.  Pure jnp ops —
    safe to call inside jit (XLA hoists it out of rollout scans since params
    are loop constants).
    """
    p = params["params"] if "params" in params else params
    L, E = cfg.n_layer, cfg.n_embd
    wqkv = jnp.stack([p[f"h_{l}"]["attn"]["c_attn"]["kernel"]
                      for l in range(L)]).astype(jnp.float32)
    fold = (1.0 / math.sqrt(E // cfg.n_head)) * _LOG2E
    wqkv = wqkv.at[:, :, :E].multiply(fold)
    return {
        "wqkv": wqkv.astype(jnp.bfloat16),
        "wproj": jnp.stack([p[f"h_{l}"]["attn"]["c_proj"]["kernel"]
                            for l in range(L)]).astype(jnp.bfloat16),
        "wfc": jnp.stack([p[f"h_{l}"]["mlp"]["c_fc"]["kernel"]
                          for l in range(L)]).astype(jnp.bfloat16),
        "wfc2": jnp.stack([p[f"h_{l}"]["mlp"]["c_proj"]["kernel"]
                           for l in range(L)]).astype(jnp.bfloat16),
        "g1": jnp.stack([p[f"h_{l}"]["ln_1"]["scale"]
                         for l in range(L)]).astype(jnp.float32),
        "g2": jnp.stack([p[f"h_{l}"]["ln_2"]["scale"]
                         for l in range(L)]).astype(jnp.float32),
    }


def default_ctx_per_program(cfg) -> int:
    """Contexts per program, sized against the scoped-VMEM stack.

    Larger tiles fit thanks to the custom vmem bid in _blocks_call and run
    slightly faster, but Mosaic compile time grows ~5x from C=8 to C=16,
    which multiplies across the eval harness's per-shape-tier compiles.
    C=8 is the compile-time/runtime sweet spot (and divides the 8192-context
    bench batch, avoiding the XLA pad copy of the embedded activations that
    C=6 forced); set MAPF_GPT_TPU_CTX to override."""
    import os

    env = os.environ.get("MAPF_GPT_TPU_CTX")  # clamped to a per-model VMEM
    # cap (see below) — a warning is emitted if the requested value exceeds it
    if env:
        try:
            ctx = int(env)
        except ValueError:
            raise ValueError(
                f"MAPF_GPT_TPU_CTX={env!r} is not an integer; set it to the "
                "number of contexts per pallas program (e.g. 6 or 16)")
        if ctx < 1:
            raise ValueError(f"MAPF_GPT_TPU_CTX={ctx} must be >= 1")
        # the override is global to the process; cap it against this config's
        # VMEM envelope so a value tuned for the 2M shape can't blow the
        # budget when a 6M/85M model compiles in the same process.  Warn when
        # clamping so a user tuning ctx isn't silently benchmarking a
        # different value than they set (advisor r4).
        cap = {True: 24, False: 8}[cfg.n_embd <= 192]
        if cfg.n_embd > 384:
            cap = 4
        if ctx > cap:
            import warnings

            warnings.warn(
                f"MAPF_GPT_TPU_CTX={ctx} exceeds the n_embd={cfg.n_embd} "
                f"VMEM cap; clamped to {cap}", stacklevel=2)
        return min(ctx, cap)
    if cfg.n_embd <= 192:
        return 8   # divides the bench/eval batch shapes -> no pad copy
    if cfg.n_embd <= 384:
        return 4
    return 2


def default_layers_per_call(cfg) -> int:
    """All layers in one call while the weight stacks fit comfortably in
    VMEM alongside the activation tiles; chunk otherwise (85M)."""
    per_layer_bytes = 2 * (cfg.n_embd * 3 * cfg.n_embd + cfg.n_embd ** 2 +
                           8 * cfg.n_embd ** 2)
    budget = 48 * 2 ** 20
    return max(1, min(cfg.n_layer, budget // per_layer_bytes))


def _blocks_call(x: jnp.ndarray, stacks: dict, cfg, *, ctx: int,
                 last_only: bool, interpret: bool) -> jnp.ndarray:
    """x: [NC, T, E] bf16 -> [NC, 1|T, E] bf16 after these layers."""
    nc, t, e = x.shape
    layers = stacks["g1"].shape[0]
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)
    out_t = 1 if last_only else t
    kern = functools.partial(_block_kernel, layers=layers, heads=cfg.n_head,
                             ctx=ctx, t=t, e=e, last_only=last_only)
    # wide models (85M: 14.2 MB/layer of weights) overflow the default
    # 16 MB scoped-VMEM budget once this kernel sits inside a rollout scan;
    # bid the measured working set instead (weights + double-buffered
    # activation tiles + scratch + headroom)
    weight_bytes = sum(2 * int(np.prod(stacks[k].shape)) for k in
                       ("wqkv", "wproj", "wfc", "wfc2"))
    tile_bytes = 2 * ctx * t * e * 2 + 2 * ctx * out_t * e * 2
    scratch_bytes = ctx * t * 4 * e * 2
    vmem_limit = min(int(1.5 * (weight_bytes + tile_bytes + scratch_bytes)
                         + 16 * 2 ** 20), 110 * 2 ** 20)
    return pl.pallas_call(
        kern,
        grid=(nc // ctx,),
        in_specs=[pl.BlockSpec((ctx, t, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [full(stacks[k]) for k in
                  ("wqkv", "wproj", "wfc", "wfc2", "g1", "g2")],
        out_specs=pl.BlockSpec((ctx, out_t, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, out_t, e), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((ctx * t, 3 * e), jnp.bfloat16),
                        pltpu.VMEM((ctx * t, e), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, stacks["wqkv"], stacks["wproj"], stacks["wfc"], stacks["wfc2"],
      stacks["g1"], stacks["g2"])


def _e2e_call(tokens: jnp.ndarray, params: Any, stacks: dict, cfg, *,
              ctx: int, interpret: bool) -> jnp.ndarray:
    """tokens [NC, T] int32 -> last-position logits [NC, vocab] f32, with
    embedding, all layers, final LN and the tied head in one pallas call."""
    p = params["params"] if "params" in params else params
    nc, t = tokens.shape
    e = cfg.n_embd
    tl = min(8, t)
    vpad = 128  # one lane tile; all current configs have vocab 67
    if cfg.vocab_size > vpad:
        raise ValueError(
            f"vocab_size={cfg.vocab_size} exceeds the e2e kernel's single "
            f"lane-tile head padding (vpad={vpad}); widen vpad to "
            "-(-vocab_size // 128) * 128 and re-tune the head matmul")
    wte = p["wte"].astype(jnp.bfloat16)
    # ctx-tiled position embeddings and zero-padded transposed head weights,
    # precomputed here (XLA hoists them as loop constants) so the kernel
    # needs no lane<->sublane relayouts
    wpet = jnp.tile(p["wpe"][:t], (ctx, 1)).astype(jnp.bfloat16)
    wht = jnp.concatenate(
        [wte.astype(jnp.float32).T,
         jnp.zeros((e, vpad - cfg.vocab_size), jnp.float32)], axis=1)
    gf = p["ln_f"]["scale"].astype(jnp.float32)
    kern = functools.partial(_e2e_kernel, layers=cfg.n_layer,
                             heads=cfg.n_head, ctx=ctx, t=t, e=e, vpad=vpad)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)
    weight_bytes = sum(2 * int(np.prod(stacks[k].shape)) for k in
                       ("wqkv", "wproj", "wfc", "wfc2"))
    tile_bytes = 2 * ctx * t * 4 + 2 * ctx * tl * vpad * 4
    scratch_bytes = ctx * t * 4 * e * 2 + ctx * t * e * 4  # qkv/att + embed
    vmem_limit = min(int(1.5 * (weight_bytes + tile_bytes + scratch_bytes)
                         + 16 * 2 ** 20), 110 * 2 ** 20)
    out = pl.pallas_call(
        kern,
        grid=(nc // ctx,),
        in_specs=[pl.BlockSpec((ctx, t, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(wte), full(wpet), full(wht)] +
                 [full(stacks[k]) for k in
                  ("wqkv", "wproj", "wfc", "wfc2", "g1", "g2")] +
                 [full(gf)],
        out_specs=pl.BlockSpec((ctx, tl, vpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, tl, vpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ctx * t, 3 * e), jnp.bfloat16),
                        pltpu.VMEM((ctx * t, e), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(tokens.astype(jnp.int32)[:, :, None], wte, wpet, wht, stacks["wqkv"],
      stacks["wproj"], stacks["wfc"], stacks["wfc2"], stacks["g1"],
      stacks["g2"], gf)
    return out[:, tl - 1, :cfg.vocab_size]


def fused_logits(params: Any, tokens: jnp.ndarray, cfg, *,
                 ctx_per_program: int | None = None,
                 layers_per_call: int | None = None,
                 interpret: bool | None = None) -> jnp.ndarray:
    """Full forward: tokens [N, T] int -> last-position logits [N, vocab] f32.

    Semantically matches models.gpt.GPT.__call__(last_only=True) for
    bias=False, dropout=0 configs, within bf16 tolerance (see module
    docstring for the two deliberate approximations).
    """
    assert not cfg.bias, "fused kernel supports bias=False models only"
    p = params["params"] if "params" in params else params
    n, t = tokens.shape
    ctx = ctx_per_program or default_ctx_per_program(cfg)
    lpc = layers_per_call or default_layers_per_call(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    stacks = stack_block_weights(params, cfg)
    if lpc >= cfg.n_layer:
        # single-call path (2M/6M): embedding + layers + head in one kernel
        pad = (-n) % ctx
        toks = (jnp.pad(tokens, ((0, pad), (0, 0))) if pad else tokens)
        logits = _e2e_call(toks, params, stacks, cfg, ctx=ctx,
                           interpret=interpret)
        return logits[:n] if pad else logits

    # chunked path (85M): XLA embedding, per-chunk kernels, XLA head
    wte, wpe = p["wte"], p["wpe"]
    x = (wte[tokens] + wpe[None, :t]).astype(jnp.bfloat16)
    pad = (-n) % ctx
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    for lo in range(0, cfg.n_layer, lpc):
        hi = min(lo + lpc, cfg.n_layer)
        chunk = {k: v[lo:hi] for k, v in stacks.items()}
        last = hi == cfg.n_layer
        x = _blocks_call(x, chunk, cfg, ctx=ctx, last_only=last,
                         interpret=interpret)
    xl = x[:, 0, :]
    if pad:
        xl = xl[:n]
    xf = _ln_f32(xl.astype(jnp.float32), p["ln_f"]["scale"][None, :])
    return jnp.dot(xf, wte.T.astype(jnp.float32))
