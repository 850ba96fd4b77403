"""Throughput + MFU meters and jax.profiler helpers.

The reference logs per-iter wall time and MFU against the A100 bf16 peak
(ref:mapf_gpt/model.py:228-242, ref:train.py:343-355).  Here MFU is measured
against the local chip's peak, with the same PaLM-appendix-B flop model."""

from __future__ import annotations

import contextlib
import time

import jax

# bf16 peak FLOPS per chip by TPU generation (public spec sheet numbers)
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}
A100_PEAK_FLOPS = 312e12  # the reference's yardstick (ref:model.py:240)


def chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in TPU_PEAK_FLOPS.items():
        if key in kind:
            return val
    return A100_PEAK_FLOPS


def transformer_flops_per_token(n_params: int, n_layer: int, n_head: int,
                                head_dim: int, seq_len: int) -> float:
    """PaLM appendix-B estimate: 6N + 12*L*H*Q*T (ref:model.py:228-238)."""
    return 6 * n_params + 12 * n_layer * n_head * head_dim * seq_len


class Meter:
    """Exponentially smoothed steps/s + MFU meter."""

    def __init__(self, flops_per_step: float, beta: float = 0.9):
        self.flops_per_step = flops_per_step
        self.beta = beta
        self.smoothed = None
        self._t = None

    def tick(self, steps: int = 1) -> tuple[float, float]:
        """Call at host-sync points, passing the number of steps executed
        since the previous call (on async-dispatch platforms, per-step wall
        times are dispatch times, not execution times — only measure across
        genuine synchronization).  Returns (steps_per_s, mfu), smoothed."""
        now = time.perf_counter()
        if self._t is None:
            self._t = now
            return 0.0, 0.0
        dt = now - self._t
        self._t = now
        sps = steps / max(dt, 1e-9)
        self.smoothed = sps if self.smoothed is None else (
            self.beta * self.smoothed + (1 - self.beta) * sps)
        mfu = self.smoothed * self.flops_per_step / chip_peak_flops()
        return self.smoothed, mfu


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
