"""Observability: span timers, throughput meters, jax.profiler hooks.

The reference's tracing is wall-clock ``time.time()`` spans around ops and
decode steps plus GPUtil prints (SURVEY.md §5).  TPU-native equivalents:

- ``span`` / ``Timer``: host-side wall-clock spans with ``block_until_ready``
  so device work is actually measured (lazy dispatch otherwise lies);
- ``throughput``: tokens/sec meters like ``run_epoch``'s
  (``iwslt14_train.py:92-101``);
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory with XLA op-level timelines (the profiler the reference
  never had);
- ``flops_estimate`` + ``roofline``: analytic matmul FLOP counts for the
  transformer config vs measured step time -> MXU utilisation fraction.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def span(name: str, sink: dict | None = None, sync: bool = True):
    """Wall-clock span; optionally records into ``sink[name]`` (seconds)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        dt = time.perf_counter() - t0
        if sink is not None:
            sink.setdefault(name, []).append(dt)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace -> TensorBoard-compatible dump."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Timer:
    """Measure a jitted callable: wall time with device sync."""

    warmup: int = 1
    iters: int = 5

    def measure(self, fn, *args) -> float:
        for _ in range(self.warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(self.iters):
            out = jax.block_until_ready(fn(*args))
        return (time.perf_counter() - t0) / self.iters


@dataclass
class ThroughputMeter:
    """Streaming tokens/sec (run_epoch-style logging)."""

    t0: float = field(default_factory=time.perf_counter)
    tokens: int = 0

    def add(self, n: int) -> None:
        self.tokens += n

    def rate(self) -> float:
        return self.tokens / max(time.perf_counter() - self.t0, 1e-9)

    def reset(self) -> None:
        self.t0 = time.perf_counter()
        self.tokens = 0


def transformer_flops_per_token(d_model: int, d_ff: int, num_layers: int,
                                src_len: int, tgt_len: int, vocab: int,
                                decode: bool = True) -> float:
    """Analytic decode-step FLOPs/token: linears + attention + generator."""
    attn_lin = 4 * d_model * d_model
    ffn = 2 * d_model * d_ff
    # decoder: self+cross attention
    dec_per_layer = 2 * attn_lin + ffn
    attn_scores = 2 * d_model * (tgt_len + src_len) if decode else 0
    gen = d_model * vocab
    return 2.0 * (num_layers * (dec_per_layer + attn_scores) + gen)


def roofline_fraction(measured_tokens_per_sec: float, flops_per_token: float,
                      peak_flops: float = 394e12) -> float:
    """Fraction of chip peak (v5e bf16/int8 ~394 TOPS) actually achieved."""
    return measured_tokens_per_sec * flops_per_token / peak_flops
