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
