"""Non-causal attention kernels for tiny-head GPTs (D=32..64, T=256).

The policy models put their FLOPs in very small heads (2M: 5 heads x 32 dims,
ref:experiment_setup/config-2M.py), so the XLA einsum path materializes the
[B, H, T, T] score tensor in HBM — at rollout batch sizes that's gigabytes of
traffic per layer and dominates the step.  The stock pallas flash-attention
kernel pads head_dim to 128 lanes (4x waste at D=32) and loses too.

This kernel processes G (batch*head) pairs per program with the whole T=256
score tile resident in VMEM: S = Q K^T (f32 accumulation on the MXU), row
softmax on the VPU, O = P V — no HBM round-trip for S.  Sequence length is
small enough that no online-softmax streaming is needed.

`attention(q, k, v)` dispatches to the kernel on TPU and falls back to the
einsum path elsewhere (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_einsum(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float) -> jnp.ndarray:
    """Reference path: q,k,v [B, H, T, D] -> [B, H, T, D]."""
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * scale
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att.astype(q.dtype), v)


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale: float, group: int):
    # per-pair unrolled 2D dots (K arrives pre-transposed [G, D, T]; Mosaic
    # pipelines the unrolled small matmuls better than a batched dot_general)
    for i in range(group):
        s = jax.lax.dot_general(
            q_ref[i], kt_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [T, T] in VMEM
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[i] = jax.lax.dot_general(
            p, v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float, group: int = 16) -> jnp.ndarray:
    """q,k,v: [B, H, T, D] (bf16 recommended). Returns [B, H, T, D]."""
    b, h, t, d = q.shape
    bh = b * h
    g = min(group, bh)
    qf = q.reshape(bh, t, d)
    ktf = k.reshape(bh, t, d).swapaxes(1, 2)   # [BH, D, T]
    vf = v.reshape(bh, t, d)
    pad = (-bh) % g
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        ktf = jnp.pad(ktf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
    n = qf.shape[0]
    spec = pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    spec_kt = pl.BlockSpec((g, d, t), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, group=g),
        grid=(n // g,),
        in_specs=[spec, spec_kt, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * t * t * d, transcendentals=n * t * t,
            bytes_accessed=4 * n * t * d * q.dtype.itemsize),
    )(qf, ktf, vf)
    if pad:
        out = out[:bh]
    return out.reshape(b, h, t, d)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
              impl: str = "auto") -> jnp.ndarray:
    """Dispatch between implementations.

    Measured on TPU v5e at [8192, 5, 256, 32] (the 2M rollout shape, host-
    synced timing): standalone core einsum 73 ms vs pallas 52 ms — the kernel
    avoids the HBM round-trip of the fp32 score tensor and sits near the
    MXU floor for D=32 contractions (~25 % utilization from K-dim padding).
    The production inference path goes further: ops/fused_gpt.py fuses the
    whole model (attention included) into one megakernel, so this module now
    serves the flax/XLA path (training-with-dropout, CPU tests) where
    ``auto`` keeps the einsum form XLA can differentiate and fuse.
    """
    if impl == "pallas":
        return attention_pallas(q, k, v, scale)
    return attention_einsum(q, k, v, scale)
