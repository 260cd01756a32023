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
