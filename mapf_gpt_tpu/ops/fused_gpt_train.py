"""Fused training path: whole-model forward+backward pallas megakernels.

The inference megakernel (ops/fused_gpt.py) removes the HBM round-trips that
make the XLA forward bandwidth-bound; training has the same problem ~3x over
(fwd + bwd + fp32 score tensors — the XLA backward at batch 4096 OOMs on a
5 GB [B, H, T, T] fp32 score allocation and runs ~14 TF/s at batch 2048).

Structure:

- ``blocks_train_fwd`` kernel: the inference forward plus two residual-stream
  saves per layer (x_l and x_mid_l, bf16) — everything else (LN stats, QKV,
  attention probabilities, MLP hidden) is recomputed in VMEM during the
  backward, the classic activation-recompute trade, except here the
  recompute never touches HBM.
- ``blocks_train_bwd`` kernel: walks layers in reverse inside one program per
  context tile; weight gradients accumulate in fp32 output blocks with a
  constant index map — TPU grid steps execute sequentially on the core, so
  revisited output blocks stay resident in VMEM and act as accumulators.
- :func:`fused_blocks_train` wraps the pair in ``jax.custom_vjp``.  Primal
  output is the last-position activation [N, E] (the only position the loss
  reads, so upstream gradients are zero elsewhere by construction).
- :func:`fused_loss_and_grad` composes embeddings + blocks + head + CE loss;
  the stacks are built from the flax param tree with plain jnp ops, so
  autodiff routes the stack gradients back to the per-layer parameters, and
  the embedding/head/final-LN gradients come from XLA autodiff directly.

Semantics match the flax training path (models/gpt.py + train/train_step.py)
for bias=False, dropout=0 — the reference's training configuration
(ref:train.py:44) — with the tanh-GELU approximation as in the inference
kernel (Mosaic has no erf lowering).
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

_EPS = 1e-5
_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _ln_fwd(x_f32, gain):
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    xc = x_f32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = xc * rstd
    return xhat * gain, xhat, rstd


def _ln_bwd(dy_f32, xhat, rstd, gain):
    """Returns (dx, dgain_rows) for y = xhat * gain."""
    dxhat = dy_f32 * gain
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd
    return dx, dy_f32 * xhat


def _gelu_tanh(h):
    u = _SQRT_2_OVER_PI * (h + _GELU_C * h * h * h)
    return 0.5 * h * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(h):
    u = _SQRT_2_OVER_PI * (h + _GELU_C * h * h * h)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * h * h)
    return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du


def _attention_fwd(qkv_s, att_s, c, t, e, heads, scale):
    """Recompute-or-compute attention for one context (rows c*t:(c+1)*t)."""
    dh = e // heads
    rows = pl.ds(pl.multiple_of(c * t, t), t)
    for h in range(heads):
        q = qkv_s[rows, h * dh:(h + 1) * dh]
        k = qkv_s[rows, e + h * dh:e + (h + 1) * dh]
        v = qkv_s[rows, 2 * e + h * dh:2 * e + (h + 1) * dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s)
        p = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        a = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        att_s[rows, h * dh:(h + 1) * dh] = a.astype(jnp.bfloat16)


def _fwd_kernel(x_ref, wqkv_ref, wproj_ref, wfc_ref, wfc2_ref, g1_ref, g2_ref,
                o_ref, xsave_ref, qkv_s, att_s, *,
                layers: int, heads: int, ctx: int, t: int, e: int,
                last_only: bool = True):
    scale = 1.0 / math.sqrt(e // heads)
    x = x_ref[...].reshape(ctx * t, e)
    for l in range(layers):
        xsave_ref[2 * l] = x.reshape(ctx, t, e)
        xn, _, _ = _ln_fwd(x.astype(jnp.float32), g1_ref[l][None, :])
        qkv_s[...] = jnp.dot(xn.astype(jnp.bfloat16), wqkv_ref[l],
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)

        def ctx_body(c, _):
            _attention_fwd(qkv_s, att_s, c, t, e, heads, scale)
            return 0

        jax.lax.fori_loop(0, ctx, ctx_body, 0)
        x = x + jnp.dot(att_s[...], wproj_ref[l],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        xsave_ref[2 * l + 1] = x.reshape(ctx, t, e)
        xn2, _, _ = _ln_fwd(x.astype(jnp.float32), g2_ref[l][None, :])
        hmid = jnp.dot(xn2.astype(jnp.bfloat16), wfc_ref[l],
                       preferred_element_type=jnp.float32)
        hact = _gelu_tanh(hmid).astype(jnp.bfloat16)
        x = x + jnp.dot(hact, wfc2_ref[l],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
    if last_only:
        o_ref[...] = x.reshape(ctx, t, e)[:, t - 1:t, :]
    else:
        o_ref[...] = x.reshape(ctx, t, e)


def _bwd_kernel(xsave_ref, dxin_ref, wqkv_ref, wproj_ref, wfc_ref, wfc2_ref,
                g1_ref, g2_ref,
                dx0_ref, dwqkv_ref, dwproj_ref, dwfc_ref, dwfc2_ref,
                dg1_ref, dg2_ref, qkv_s, att_s, datt_s, dqkv_s, *,
                layers: int, heads: int, ctx: int, t: int, e: int):
    scale = 1.0 / math.sqrt(e // heads)
    dh = e // heads
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dwfc_ref[...] = jnp.zeros_like(dwfc_ref)
        dwfc2_ref[...] = jnp.zeros_like(dwfc2_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)

    dx = dxin_ref[...].reshape(ctx * t, e).astype(jnp.float32)

    for l in range(layers - 1, -1, -1):
        x_in = xsave_ref[2 * l].reshape(ctx * t, e)          # bf16
        x_mid = xsave_ref[2 * l + 1].reshape(ctx * t, e)     # bf16

        # ---- MLP backward (recompute xn2, h) -----------------------------
        xn2f, xhat2, rstd2 = _ln_fwd(x_mid.astype(jnp.float32),
                                     g2_ref[l][None, :])
        xn2 = xn2f.astype(jnp.bfloat16)
        hmid = jnp.dot(xn2, wfc_ref[l], preferred_element_type=jnp.float32)
        hact = _gelu_tanh(hmid).astype(jnp.bfloat16)
        dxb = dx.astype(jnp.bfloat16)
        # dWfc2 += hact^T dx
        dwfc2_ref[l] += jax.lax.dot_general(
            hact, dxb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dhact = jax.lax.dot_general(dxb, wfc2_ref[l],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dhmid = dhact * _gelu_tanh_grad(hmid)
        dhb = dhmid.astype(jnp.bfloat16)
        dwfc_ref[l] += jax.lax.dot_general(
            xn2, dhb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn2 = jax.lax.dot_general(dhb, wfc_ref[l], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dx_ln2, dg2_rows = _ln_bwd(dxn2, xhat2, rstd2, g2_ref[l][None, :])
        dg2_ref[l] += jnp.sum(dg2_rows, axis=0)
        dx = dx + dx_ln2  # residual + LN path, now gradient wrt x_mid

        # ---- attention backward (recompute xn1, qkv, probs) --------------
        xn1f, xhat1, rstd1 = _ln_fwd(x_in.astype(jnp.float32),
                                     g1_ref[l][None, :])
        xn1 = xn1f.astype(jnp.bfloat16)
        qkv_s[...] = jnp.dot(xn1, wqkv_ref[l],
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)
        dxb = dx.astype(jnp.bfloat16)
        # recompute att (needed for dWproj) and datt
        def ctx_fwd(c, _):
            _attention_fwd(qkv_s, att_s, c, t, e, heads, scale)
            return 0

        jax.lax.fori_loop(0, ctx, ctx_fwd, 0)
        dwproj_ref[l] += jax.lax.dot_general(
            att_s[...], dxb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        datt_s[...] = jax.lax.dot_general(
            dxb, wproj_ref[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def ctx_bwd(c, _):
            rows = pl.ds(pl.multiple_of(c * t, t), t)
            for h in range(heads):
                q = qkv_s[rows, h * dh:(h + 1) * dh]
                k = qkv_s[rows, e + h * dh:e + (h + 1) * dh]
                v = qkv_s[rows, 2 * e + h * dh:2 * e + (h + 1) * dh]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ) * scale
                s = s - jnp.max(s, axis=-1, keepdims=True)
                ex = jnp.exp(s)
                p = ex / jnp.sum(ex, axis=-1, keepdims=True)      # f32 [t,t]
                da = datt_s[rows, h * dh:(h + 1) * dh]            # bf16
                pb = p.astype(jnp.bfloat16)
                # dv = p^T da
                dv = jax.lax.dot_general(pb, da, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                # dp = da v^T
                dp = jax.lax.dot_general(da, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p
                ds = (ds * scale).astype(jnp.bfloat16)
                dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dqkv_s[rows, h * dh:(h + 1) * dh] = dq.astype(jnp.bfloat16)
                dqkv_s[rows, e + h * dh:e + (h + 1) * dh] = (
                    dk.astype(jnp.bfloat16))
                dqkv_s[rows, 2 * e + h * dh:2 * e + (h + 1) * dh] = (
                    dv.astype(jnp.bfloat16))
            return 0

        jax.lax.fori_loop(0, ctx, ctx_bwd, 0)
        dwqkv_ref[l] += jax.lax.dot_general(
            xn1, dqkv_s[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn1 = jax.lax.dot_general(dqkv_s[...], wqkv_ref[l],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dx_ln1, dg1_rows = _ln_bwd(dxn1, xhat1, rstd1, g1_ref[l][None, :])
        dg1_ref[l] += jnp.sum(dg1_rows, axis=0)
        dx = dx + dx_ln1  # gradient wrt x_in

    dx0_ref[...] = dx.reshape(ctx, t, e).astype(dx0_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------

_STACK_KEYS = ("wqkv", "wproj", "wfc", "wfc2", "g1", "g2")


def default_train_ctx(cfg) -> int:
    """Contexts per program for the training kernels: half the inference
    tile — the residual-stream saves ([2L, ctx, T, E]) share the ~16 MB
    scoped-VMEM stack with the working set."""
    if cfg.n_embd <= 192:
        return 4
    if cfg.n_embd <= 384:
        return 2
    return 1


def build_train_stacks(params: Any, cfg) -> tuple:
    """Stack per-layer flax params (bf16 weights, f32 LN gains) WITHOUT the
    inference-time scale folding (gradients must map back to raw params)."""
    p = params["params"] if "params" in params else params
    L = cfg.n_layer
    return (
        jnp.stack([p[f"h_{l}"]["attn"]["c_attn"]["kernel"]
                   for l in range(L)]).astype(jnp.bfloat16),
        jnp.stack([p[f"h_{l}"]["attn"]["c_proj"]["kernel"]
                   for l in range(L)]).astype(jnp.bfloat16),
        jnp.stack([p[f"h_{l}"]["mlp"]["c_fc"]["kernel"]
                   for l in range(L)]).astype(jnp.bfloat16),
        jnp.stack([p[f"h_{l}"]["mlp"]["c_proj"]["kernel"]
                   for l in range(L)]).astype(jnp.bfloat16),
        jnp.stack([p[f"h_{l}"]["ln_1"]["scale"]
                   for l in range(L)]).astype(jnp.float32),
        jnp.stack([p[f"h_{l}"]["ln_2"]["scale"]
                   for l in range(L)]).astype(jnp.float32),
    )


def _full_spec(arr):
    return pl.BlockSpec(arr.shape, lambda i: tuple(0 for _ in arr.shape),
                        memory_space=pltpu.VMEM)


def _fwd_call(stacks, x, cfg, ctx, interpret, last_only=True):
    """One forward chunk over the layers present in `stacks`.

    Returns (out, xsave): out is [NC, E] last-position activations when
    last_only else the full [NC, T, E] stream (fed to the next chunk)."""
    nc, t, e = x.shape
    L = stacks[4].shape[0]
    kern = functools.partial(_fwd_kernel, layers=L, heads=cfg.n_head,
                             ctx=ctx, t=t, e=e, last_only=last_only)
    out_t = 1 if last_only else t
    out_shapes = (jax.ShapeDtypeStruct((nc, out_t, e), jnp.bfloat16),
                  jax.ShapeDtypeStruct((2 * L, nc, t, e), jnp.bfloat16))
    # bid the measured working set (weights + double-buffered x/xsave tiles +
    # scratch + headroom): the 2M shape sits ~0.4 MB over the default 16 MB
    # scoped-vmem limit, which is a compile error, not a fallback
    weight_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                       for s in stacks)
    tile_bytes = 2 * (ctx * t * e * 2 + 2 * L * ctx * t * e * 2 +
                      ctx * out_t * e * 2)
    scratch_bytes = ctx * t * 4 * e * 2
    vmem_limit = min(int(1.5 * (weight_bytes + tile_bytes + scratch_bytes))
                     + 8 * 2 ** 20, 110 * 2 ** 20)
    xl, xsave = pl.pallas_call(
        kern,
        grid=(nc // ctx,),
        in_specs=[pl.BlockSpec((ctx, t, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [_full_spec(s) for s in stacks],
        out_specs=(pl.BlockSpec((ctx, out_t, e), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2 * L, ctx, t, e), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((ctx * t, 3 * e), jnp.bfloat16),
                        pltpu.VMEM((ctx * t, e), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, *stacks)
    return (xl[:, 0, :] if last_only else xl), xsave


def _bwd_call(stacks, xsave, dxin, cfg, ctx, interpret):
    """One backward chunk: stacks/xsave cover `chunk_layers` layers; dxin is
    the upstream gradient wrt the chunk's output (bf16 [NC, T, E]).  Returns
    (dx_chunk_input, per-stack weight grads)."""
    two_l, nc, t, e = xsave.shape
    chunk_layers = two_l // 2
    kern = functools.partial(_bwd_kernel, layers=chunk_layers,
                             heads=cfg.n_head, ctx=ctx, t=t, e=e)
    out_shapes = (
        jax.ShapeDtypeStruct((nc, t, e), jnp.bfloat16),           # dx_in
        jax.ShapeDtypeStruct(stacks[0].shape, jnp.float32),       # dwqkv
        jax.ShapeDtypeStruct(stacks[1].shape, jnp.float32),       # dwproj
        jax.ShapeDtypeStruct(stacks[2].shape, jnp.float32),       # dwfc
        jax.ShapeDtypeStruct(stacks[3].shape, jnp.float32),       # dwfc2
        jax.ShapeDtypeStruct(stacks[4].shape, jnp.float32),       # dg1
        jax.ShapeDtypeStruct(stacks[5].shape, jnp.float32),       # dg2
    )
    grad_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((ctx, t, e), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    # the fp32 weight-grad accumulator outputs alone are ~28 MB/layer at
    # 85M (E=768) — past the default 16 MB scoped-VMEM budget, so raise it
    # (v5e has 128 MB physical VMEM; the working set is measured, not bid)
    grad_bytes = sum(4 * int(np.prod(s.shape)) for s in stacks)
    vmem_limit = max(32 * 2 ** 20, grad_bytes + 40 * 2 ** 20)
    outs = pl.pallas_call(
        kern,
        grid=(nc // ctx,),
        in_specs=[pl.BlockSpec((two_l, ctx, t, e), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM), tile] +
                 [_full_spec(s) for s in stacks],
        out_specs=(tile,
                   grad_spec(stacks[0]), grad_spec(stacks[1]),
                   grad_spec(stacks[2]), grad_spec(stacks[3]),
                   grad_spec(stacks[4]), grad_spec(stacks[5])),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((ctx * t, 3 * e), jnp.bfloat16),
                        pltpu.VMEM((ctx * t, e), jnp.bfloat16),
                        pltpu.VMEM((ctx * t, e), jnp.bfloat16),
                        pltpu.VMEM((ctx * t, 3 * e), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(xsave, dxin, *stacks)
    return outs


def _fwd_layers_per_call(cfg) -> int:
    """All layers in one call while the bf16 weight stacks fit in VMEM next
    to the activation tile (2M: 3.2 MB, 6M: 12.6 MB); chunk otherwise
    (85M: 14.2 MB/layer -> 2-layer chunks, x round-trips HBM between
    chunks exactly like the inference kernel's layers_per_call)."""
    return cfg.n_layer if cfg.n_embd <= 384 else 2


def _fwd_chunks(stacks, x, cfg, ctx, interpret):
    L = cfg.n_layer
    lpc = _fwd_layers_per_call(cfg)
    if lpc >= L:
        return _fwd_call(stacks, x, cfg, ctx, interpret, last_only=True)
    saves = []
    xl = None
    for lo in range(0, L, lpc):
        hi = min(lo + lpc, L)
        sl = tuple(s[lo:hi] for s in stacks)
        last = hi == L
        out, xsave = _fwd_call(sl, x, cfg, ctx, interpret, last_only=last)
        saves.append(xsave)
        if last:
            xl = out
        else:
            x = out
    return xl, jnp.concatenate(saves, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_blocks_train(stacks: tuple, x: jnp.ndarray, cfg,
                       ctx: int, interpret: bool) -> jnp.ndarray:
    """x: [N, T, E] bf16 embeddings -> last-position activations [N, E]."""
    xl, _ = _fwd_chunks(stacks, x, cfg, ctx, interpret)
    return xl


def _fbt_fwd(stacks, x, cfg, ctx, interpret):
    xl, xsave = _fwd_chunks(stacks, x, cfg, ctx, interpret)
    return xl, (stacks, xsave)


def _bwd_layers_per_call(cfg) -> int:
    """The backward additionally keeps fp32 weight-grad accumulators
    resident (2x the bf16 weight bytes), so chunk harder for wide models."""
    return 2 if cfg.n_embd <= 384 else 1


def _fbt_bwd(cfg, ctx, interpret, res, dxl):
    stacks, xsave = res
    L = cfg.n_layer
    _, nc, t, e = xsave.shape
    # the backward working set (fp32 recomputes + resident weight-grad
    # accumulators) is ~2x the forward's: halve the context tile and walk
    # layers in chunks, round-tripping dx through HBM between chunks
    ctx_b = max(1, ctx // 2)
    blpc = _bwd_layers_per_call(cfg)
    # upstream gradient: the loss reads the last position only
    dx = jnp.pad(dxl.astype(jnp.bfloat16)[:, None, :],
                 ((0, 0), (t - 1, 0), (0, 0)))
    chunk_grads = []  # per chunk (top-down), each a 6-tuple
    for lo in reversed(range(0, L, blpc)):
        hi = min(lo + blpc, L)
        sl = tuple(s[lo:hi] for s in stacks)
        outs = _bwd_call(sl, xsave[2 * lo:2 * hi], dx, cfg, ctx_b, interpret)
        dx = outs[0]
        chunk_grads.append(outs[1:])
    bottom_up = list(reversed(chunk_grads))
    dstacks = tuple(
        jnp.concatenate([g[k] for g in bottom_up], axis=0
                        ).astype(stacks[k].dtype)
        for k in range(6))
    return dstacks, dx


fused_blocks_train.defvjp(_fbt_fwd, _fbt_bwd)


def fused_loss_fn(cfg, params, tokens: jnp.ndarray, targets: jnp.ndarray,
                  *, ctx_per_program: int | None = None,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for train_step.loss_fn using the fused kernels.

    tokens: int32 [B, T]; targets: int32 [B].  Differentiable wrt params.
    """
    import optax

    assert not cfg.bias and cfg.dropout == 0.0
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ctx = ctx_per_program or default_train_ctx(cfg)
    p = params["params"] if "params" in params else params
    n, t = tokens.shape
    pad = (-n) % ctx

    wte, wpe = p["wte"], p["wpe"]
    x = (wte[tokens] + wpe[None, :t]).astype(jnp.bfloat16)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    stacks = build_train_stacks(params, cfg)
    xl = fused_blocks_train(stacks, x, cfg, ctx, interpret)
    if pad:
        xl = xl[:n]
    xf32 = xl.astype(jnp.float32)
    mu = jnp.mean(xf32, axis=-1, keepdims=True)
    xc = xf32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + _EPS) * p["ln_f"]["scale"][None, :]
    logits = jnp.dot(xhat, wte.T.astype(jnp.float32))
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, targets).mean()
