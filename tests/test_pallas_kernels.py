"""Pallas kernel tests (interpret mode on CPU; real compilation is exercised
by bench.py on the TPU chip).  Oracle: exact integer matmul in numpy — the
TPU-native version of the reference's qonnx-interpreter-vs-ORT dual path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.ops.pallas.w8a8_matmul import quant_w8a8_matmul, w8a8_matmul


def _case(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    sw = (np.abs(w).max(0) / 127).astype(np.float32)
    wq = np.round(w / sw).astype(np.int8)
    sx = (np.abs(x).max(-1, keepdims=True) / 127).astype(np.float32)
    xq = np.round(x / sx).astype(np.int8)
    b = rng.normal(size=n).astype(np.float32)
    want = (xq.astype(np.int64) @ wq.astype(np.int64)).astype(np.float32) * (
        sx * sw[None, :]
    ) + b
    return x, xq, sx, wq, sw, b, want


@pytest.mark.parametrize("m,k,n", [(64, 128, 128), (100, 512, 256), (8, 256, 512)])
def test_w8a8_matmul_exact(m, k, n):
    x, xq, sx, wq, sw, b, want = _case(m, k, n)
    got = np.array(
        w8a8_matmul(jnp.asarray(xq), jnp.asarray(sx[:, 0]), jnp.asarray(wq),
                    jnp.asarray(sw), jnp.asarray(b), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_w8a8_matmul_batched_lead_dims():
    x, xq, sx, wq, sw, b, want = _case(60, 128, 128)
    xq3 = xq.reshape(4, 15, 128)
    sx3 = sx[:, 0].reshape(4, 15)
    got = np.array(
        w8a8_matmul(jnp.asarray(xq3), jnp.asarray(sx3), jnp.asarray(wq),
                    jnp.asarray(sw), jnp.asarray(b), interpret=True)
    )
    np.testing.assert_allclose(got.reshape(60, 128), want, rtol=1e-6, atol=1e-4)


def test_quant_w8a8_matmul_fused_quantization():
    x, xq, sx, wq, sw, b, want = _case(32, 256, 128)
    got = np.array(
        quant_w8a8_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(sw),
                          jnp.asarray(b), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_w8a8_no_bias():
    x, xq, sx, wq, sw, b, want = _case(16, 128, 128)
    got = np.array(
        w8a8_matmul(jnp.asarray(xq), jnp.asarray(sx[:, 0]), jnp.asarray(wq),
                    jnp.asarray(sw), None, interpret=True)
    )
    np.testing.assert_allclose(got, want - b, rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("k,block_k", [(512, 128), (384, 128), (300, 128)])
def test_w8a8_matmul_k_tiled(k, block_k):
    """K-tiling: int32 scratch accumulation across the K grid dim, with
    zero-padding of a ragged final K tile (exact in the int domain)."""
    x, xq, sx, wq, sw, b, want = _case(64, k, 256)
    got = np.array(
        w8a8_matmul(jnp.asarray(xq), jnp.asarray(sx[:, 0]), jnp.asarray(wq),
                    jnp.asarray(sw), jnp.asarray(b), block_k=block_k,
                    interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


# ----------------------------------------------------- fused decode attention

from onnx_transformer_tpu.ops.pallas.attention import (  # noqa: E402
    decode_attention_int8,
    decode_attention_int8_oracle,
)


def _attn_case(b=5, h=8, t=72, d=512, seed=0):
    """Merged-head layout: kq/vq [B,T,D] int8 + per-token [B,T] scales."""
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, d)).astype(np.float32)
    kq = rng.integers(-127, 128, (b, t, d)).astype(np.int8)
    vq = rng.integers(-127, 128, (b, t, d)).astype(np.int8)
    ks = rng.uniform(0.001, 0.05, (b, t)).astype(np.float32)
    vs = rng.uniform(0.001, 0.05, (b, t)).astype(np.float32)
    # ragged per-row visibility (decode positions differ across rows)
    lens = rng.integers(1, t + 1, b)
    mask = (np.arange(t)[None, :] < lens[:, None])
    return tuple(jnp.asarray(a) for a in (q, kq, ks, vq, vs, mask))


@pytest.mark.parametrize("quantize", [True, False])
def test_decode_attention_int8_matches_oracle(quantize):
    args = _attn_case()
    got = np.array(decode_attention_int8(*args, num_heads=8, quantize=quantize,
                                         interpret=True))
    want = np.array(decode_attention_int8_oracle(*args, num_heads=8,
                                                 quantize=quantize))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_decode_attention_int8_block_padding():
    """B not a multiple of block_b exercises the pad/slice path."""
    args = _attn_case(b=3)
    got = np.array(decode_attention_int8(*args, num_heads=8, block_b=8,
                                         interpret=True))
    want = np.array(decode_attention_int8_oracle(*args, num_heads=8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_decode_end_to_end_matches_jnp_path():
    """greedy_decode(fused_attn=True) must emit the identical trajectory to
    the jnp int8-cache path (which is itself parity-tested vs no-cache)."""
    from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
    from onnx_transformer_tpu.quant import w8a8 as W
    from onnx_transformer_tpu.serving import decode as D
    from onnx_transformer_tpu.ops import layers as L

    cfg = TransformerConfig(97, 89, num_layers=2, d_model=64, d_ff=128,
                            num_heads=4, dropout=0.0)
    model = Transformer(cfg)
    params = model.init(jax.random.key(0))
    _, lin8 = W.quantize_transformer(model, params, mode="int8")
    src = jnp.asarray(np.random.default_rng(1).integers(3, 90, (4, 9)))
    sm = L.make_src_mask(src)
    ys_jnp = D.greedy_decode(model, params, src, sm, 12, lin=lin8,
                             kv_cache_dtype="int8")
    ys_fused = D.greedy_decode(model, params, src, sm, 12, lin=lin8,
                               kv_cache_dtype="int8", fused_attn=True)
    np.testing.assert_array_equal(np.array(ys_jnp), np.array(ys_fused))


def test_quant_w8a8_matmul_large_k_fallback():
    """K beyond the VMEM-fused limit routes through quantize + K-tiled
    int8 kernel with identical numerics."""
    from onnx_transformer_tpu.ops.pallas import w8a8_matmul as KM
    old = KM.quant_w8a8_matmul
    x, xq, sx, wq, sw, b, want = _case(16, 256, 128)
    # force the fallback by monkeying the threshold via a big-K case:
    x2 = np.concatenate([x] * 40, axis=1)          # K = 10240 > 8192
    w2 = np.concatenate([wq] * 40, axis=0)
    sx2 = (np.abs(x2).max(-1, keepdims=True) / 127).astype(np.float32)
    xq2 = np.round(x2 / sx2).astype(np.int8)
    want2 = (xq2.astype(np.int64) @ w2.astype(np.int64)).astype(np.float32) * (
        sx2 * sw[None, :]) + b
    got = np.array(KM.quant_w8a8_matmul(
        jnp.asarray(x2), jnp.asarray(w2), jnp.asarray(sw), jnp.asarray(b),
        interpret=True))
    np.testing.assert_allclose(got, want2, rtol=1e-6, atol=1e-4)


def test_quant_w8a8_matmul_ktiled_parity():
    """K=16384 > MAX_FUSED_K exercises the two-phase K-tiled kernel
    (VERDICT r2 #9): must equal the jnp per-token-quantize reference
    bit-for-bit in the int domain (identical absmax scale semantics)."""
    import numpy as np
    from onnx_transformer_tpu.ops.pallas.w8a8_matmul import quant_w8a8_matmul
    from onnx_transformer_tpu.quant.core import quantize_act_per_token

    rng = np.random.default_rng(11)
    m, k, n = 24, 16384, 96
    x = jnp.asarray(rng.normal(size=(m, k)) * 3.0, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    sw = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    got = quant_w8a8_matmul(x, wq, sw, b, block_k=4096)
    xq, sx = quantize_act_per_token(x)
    want = (jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (sx * sw[None, :]) + b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-4)


def test_quant_w8a8_matmul_ktiled_ragged_k():
    """K not divisible by block_k: zero padding must be exact."""
    import numpy as np
    from onnx_transformer_tpu.ops.pallas.w8a8_matmul import quant_w8a8_matmul
    from onnx_transformer_tpu.quant.core import quantize_act_per_token

    rng = np.random.default_rng(13)
    m, k, n = 16, 8192 + 1536, 64
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    sw = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)

    got = quant_w8a8_matmul(x, wq, sw, None, block_k=4096)
    xq, sx = quantize_act_per_token(x)
    want = (jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (sx * sw[None, :]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-4)


def test_quant_w8a8_matmul_q8_matches_qout_then_quantize():
    """q8 kernel (int8 rows + per-token scales) must equal
    quantize_act_per_token(qout-kernel output) — the cross-KV producer
    collapse (VERDICT r4 #3)."""
    import numpy as np
    from onnx_transformer_tpu.ops.pallas.w8a8_matmul import (
        quant_w8a8_matmul_q8, quant_w8a8_matmul_qout)
    from onnx_transformer_tpu.quant.core import quantize_act_per_token

    rng = np.random.default_rng(17)
    b, s, k, n = 3, 16, 64, 96
    x = jnp.asarray(rng.normal(size=(b, s, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    sw = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)

    q, sc = quant_w8a8_matmul_q8(x, wq, sw, bias)
    assert q.shape == (b, s, n) and q.dtype == jnp.int8
    assert sc.shape == (b, s, 1)
    y_fake = quant_w8a8_matmul_qout(x, wq, sw, bias)
    want_q, want_s = quantize_act_per_token(y_fake)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(want_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(want_q))


def test_cross_kv_q8_producer_matches_chain():
    """cross_kv with a fused-mode impl (kernel q8 producer) must emit the
    same int8 cache rows/scales as the fake-quant chain + quantize path,
    and the downstream greedy decode must be token-identical."""
    import numpy as np
    from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
    from onnx_transformer_tpu.ops import layers as L
    from onnx_transformer_tpu.quant import w8a8 as W
    from onnx_transformer_tpu.serving import decode as D

    cfg = TransformerConfig(src_vocab_size=37, tgt_vocab_size=31,
                            num_layers=2, d_model=32, d_ff=64, num_heads=4,
                            dropout=0.0)
    m = Transformer(cfg)
    params = m.init(jax.random.key(3))
    sp, lin8 = W.quantize_transformer(m, params, mode="int8")
    linf = W.make_w8a8_linear_impl(lin8.payloads, mode="fused")
    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.integers(4, 37, (4, 9)).astype(np.int32))
    sm = L.make_src_mask(src)
    mem = m.encode(sp, src, sm, lin=lin8)

    import onnx_transformer_tpu.quant.w8a8 as W8
    orig = W8.FUSED_MIN_TOKENS
    W8.FUSED_MIN_TOKENS = 1
    try:
        cross_k = m.cross_kv(sp, mem, lin=linf, cache_dtype="int8")
        ys_f = np.array(D.greedy_decode(m, sp, src, sm, 10, lin=linf,
                                        kv_cache_dtype="int8"))
    finally:
        W8.FUSED_MIN_TOKENS = orig
    cross_ref = m.cross_kv(sp, mem, lin=lin8, cache_dtype="int8")
    for lc_k, lc_r in zip(cross_k, cross_ref):
        np.testing.assert_allclose(np.asarray(lc_k["cross_k_scale"]),
                                   np.asarray(lc_r["cross_k_scale"]),
                                   rtol=1e-5, atol=1e-8)
        # int8 rows may differ by 1 ulp of rounding where the fp32 chain
        # and the kernel FMA paths land on a .5 boundary — count them
        diff = np.mean(np.asarray(lc_k["cross_k"]) != np.asarray(lc_r["cross_k"]))
        assert diff < 0.01, diff
    ys_r = np.array(D.greedy_decode(m, sp, src, sm, 10, lin=lin8,
                                    kv_cache_dtype="int8"))
    agree = np.mean(ys_f == ys_r)
    assert agree >= 0.95, agree


def test_quant_w4a8_qout_and_q8_match_chain():
    """W4A8 qout/q8 kernel variants vs the XLA fake-quant chain."""
    import numpy as np
    from onnx_transformer_tpu.ops.pallas.w8a8_matmul import (
        quant_w4a8_matmul, quant_w4a8_matmul_q8, quant_w4a8_matmul_qout)
    from onnx_transformer_tpu.quant.core import (
        fake_quant_act_per_token, quantize_act_per_token)

    rng = np.random.default_rng(23)
    m, k, n = 24, 64, 96
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-8, 8, (k, n)), jnp.int8)
    from onnx_transformer_tpu.quant.core import pack_int4
    packed = pack_int4(wq)
    sw = jnp.asarray(rng.uniform(0.01, 0.1, (n,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)

    y_plain = quant_w4a8_matmul(x, packed, sw, b)
    want_qout = fake_quant_act_per_token(y_plain)
    got_qout = quant_w4a8_matmul_qout(x, packed, sw, b)
    np.testing.assert_allclose(np.asarray(got_qout), np.asarray(want_qout),
                               atol=1e-5, rtol=1e-5)
    q, sc = quant_w4a8_matmul_q8(x, packed, sw, b)
    want_q, want_s = quantize_act_per_token(want_qout)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(want_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(want_q))
