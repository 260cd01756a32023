"""Observability utils tests."""

import numpy as np

from onnx_transformer_tpu.utils import profiling as P


def test_span_records():
    sink = {}
    with P.span("work", sink):
        _ = sum(range(1000))
    assert len(sink["work"]) == 1 and sink["work"][0] >= 0


def test_timer_measures_jitted():
    import jax, jax.numpy as jnp
    f = jax.jit(lambda x: x @ x)
    t = P.Timer(warmup=1, iters=2).measure(f, jnp.ones((64, 64)))
    assert t > 0


def test_throughput_meter():
    m = P.ThroughputMeter()
    m.add(100)
    assert m.rate() > 0
    m.reset()
    assert m.tokens == 0


def test_flops_and_roofline():
    f = P.transformer_flops_per_token(512, 2048, 6, 72, 72, 4444)
    assert f > 2 * 6 * (8 * 512 * 512 + 2 * 512 * 2048)  # at least the linears
    frac = P.roofline_fraction(1e6, f)
    assert 0 < frac < 1
