"""Chunk-staged fast-path decode parity: the unrolled-chunk decode
(models/stacked_decode.py) must be token-identical to the general W8A8 +
int8-KV path it accelerates (the qonnx-vs-ORT dual-executor oracle pattern,
SURVEY.md §4), and the fused-quantize Pallas prefill must match to the ulp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.models import stacked_decode as SD
from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W
from onnx_transformer_tpu.serving import decode as D


@pytest.fixture(scope="module")
def setup():
    cfg = TransformerConfig(
        src_vocab_size=37, tgt_vocab_size=31, num_layers=3, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    m = Transformer(cfg)
    params = m.init(jax.random.key(7))
    sp, lin8 = W.quantize_transformer(m, params, mode="int8")
    stacked = SD.build_stacked(m, sp, lin8.payloads)
    return m, sp, lin8, stacked


def _src(b=6, s=9, sv=37, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(4, sv, (b, s)).astype(np.int32)
    src[1, -3:] = 2
    src[4, -1:] = 2
    return jnp.asarray(src), L.make_src_mask(jnp.asarray(src))


@pytest.mark.parametrize("chunk", [2, 4])
def test_greedy_chunked_matches_general_int8(setup, chunk):
    """Chunk-staged cache writes: joint softmax over cache + in-flight
    columns must reproduce the general path token-for-token."""
    m, sp, lin8, stacked = setup
    src, sm = _src()
    max_len = 12
    ys_gen = np.array(D.greedy_decode(
        m, sp, src, sm, max_len, lin=lin8, kv_cache_dtype="int8"))
    ys_fast = np.array(SD.greedy_decode_chunked(
        m, sp, stacked, src, sm, max_len, chunk=chunk, lin=lin8))
    np.testing.assert_array_equal(ys_fast, ys_gen)


@pytest.mark.parametrize("segments", [
    2, pytest.param(3, marks=pytest.mark.slow)])
def test_greedy_chunked_segments_match_general(setup, segments):
    """Segment-grown self-KV ring (reads only the prefix that can be
    valid) must stay token-identical to the general path — masked tail
    columns contribute exact softmax zeros."""
    m, sp, lin8, stacked = setup
    src, sm = _src()
    max_len = 12
    ys_gen = np.array(D.greedy_decode(
        m, sp, src, sm, max_len, lin=lin8, kv_cache_dtype="int8"))
    ys_seg = np.array(SD.greedy_decode_chunked(
        m, sp, stacked, src, sm, max_len, chunk=2, lin=lin8,
        segments=segments))
    np.testing.assert_array_equal(ys_seg, ys_gen)


@pytest.mark.slow
def test_int8_generator_variant(setup):
    m, sp, _, _ = setup
    src, sm = _src()
    sp_g, lin8g = W.quantize_transformer(m, m.init(jax.random.key(7)),
                                         mode="int8", include_generator=True)
    stacked_g = SD.build_stacked(m, sp_g, lin8g.payloads)
    ys_gen = np.array(D.greedy_decode(
        m, sp_g, src, sm, 12, lin=lin8g, kv_cache_dtype="int8"))
    ys_fast = np.array(SD.greedy_decode_chunked(
        m, sp_g, stacked_g, src, sm, 12, chunk=4, lin=lin8g))
    np.testing.assert_array_equal(ys_fast, ys_gen)


def test_fused_mode_encoder_bit_identical(setup):
    """mode='fused' (fused-quantize Pallas kernels above the token
    threshold) must match mode='int8' to the ulp (FMA contraction differs)
    with near-total greedy-token agreement."""
    import onnx_transformer_tpu.quant.w8a8 as W8
    m, sp, lin8, _ = setup
    old = W8.FUSED_MIN_TOKENS
    W8.FUSED_MIN_TOKENS = 1   # force the kernel path at test shapes
    try:
        linf = W8.make_w8a8_linear_impl(lin8.payloads, mode="fused")
        src, sm = _src()
        mem_xla = np.array(m.encode(sp, src, sm, lin=lin8))
        mem_fused = np.array(m.encode(sp, src, sm, lin=linf))
        # kernel epilogue FMA contraction differs from the XLA chain at the
        # ulp level (measured <=2e-6); tokens must still near-always agree
        np.testing.assert_allclose(mem_fused, mem_xla, atol=1e-4, rtol=1e-5)
        ys_xla = np.array(D.greedy_decode(
            m, sp, src, sm, 10, lin=lin8, kv_cache_dtype="int8"))
        ys_fused = np.array(D.greedy_decode(
            m, sp, src, sm, 10, lin=linf, kv_cache_dtype="int8"))
        agree = np.mean(ys_fused == ys_xla)
        assert agree >= 0.95, f"token agreement {agree}"
    finally:
        W8.FUSED_MIN_TOKENS = old


@pytest.mark.slow
def test_int4_chunked_matches_general_w4a8(setup):
    """Chunked fast path fed int4-valued (unpacked) weights must match the
    general W4A8 decode token-for-token."""
    from onnx_transformer_tpu.quant.core import unpack_int4
    from onnx_transformer_tpu.quant.int4 import (
        make_w4a8_linear_impl, quantize_model_params_int4)

    m, sp, _, _ = setup
    src, sm = _src()
    pl4 = quantize_model_params_int4(m, sp)
    lin4 = make_w4a8_linear_impl(pl4, fused=False)
    pl4u = {n: {"wq": unpack_int4(p["wq_packed"]), "sw": p["sw"], "b": p["b"]}
            for n, p in pl4.items()}
    stacked4 = SD.build_stacked(m, sp, pl4u)
    ys_gen = np.array(D.greedy_decode(
        m, sp, src, sm, 12, lin=lin4, kv_cache_dtype="int8"))
    ys_fast = np.array(SD.greedy_decode_chunked(
        m, sp, stacked4, src, sm, 12, chunk=4, lin=lin4))
    np.testing.assert_array_equal(ys_fast, ys_gen)
