"""Numeric-semantics tests for ops/layers.py against hand-rolled numpy
references (the oracles SURVEY.md §4 prescribes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.ops import layers as L


def test_layer_norm_matches_bessel_std_reference():
    # reference layer_norm.py:12-15: (x - mean) / (std + eps), std ddof=1
    x = np.random.default_rng(0).normal(size=(4, 9, 16)).astype(np.float32)
    scale = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)
    bias = np.random.default_rng(2).normal(size=(16,)).astype(np.float32)
    eps = 1e-6
    mean = x.mean(-1, keepdims=True)
    std = x.std(-1, keepdims=True, ddof=1)
    want = scale * (x - mean) / (std + eps) + bias
    got = np.array(L.layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_positional_encoding_table():
    # positional_encodings.py:14-21
    d, n = 8, 16
    pe = L._pe_table(n, d)
    pos = np.arange(n)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    np.testing.assert_allclose(pe[:, 0::2], np.sin(pos * div), atol=1e-6)
    np.testing.assert_allclose(pe[:, 1::2], np.cos(pos * div), atol=1e-6)


def test_positional_encoding_offset():
    x = jnp.zeros((1, 3, 8))
    full = L.positional_encoding(jnp.zeros((1, 10, 8)))
    part = L.positional_encoding(x, offset=4)
    np.testing.assert_allclose(np.array(part[0]), np.array(full[0, 4:7]), atol=1e-6)


def test_embed_scales_by_sqrt_d():
    lut = jnp.asarray(np.random.default_rng(0).normal(size=(11, 4)).astype(np.float32))
    ids = jnp.asarray([[1, 5]])
    out = L.embed(ids, lut)
    np.testing.assert_allclose(np.array(out[0, 0]), np.array(lut[1]) * 2.0, rtol=1e-6)


def test_quantize_probs_grid():
    p = jnp.asarray([0.0, 1.0, 0.5, 0.004, 0.0039, 1 / 254])
    q = np.array(L.quantize_probs(p))
    assert set(np.round(q * 127, 6) % 1.0) == {0.0}
    np.testing.assert_allclose(q[0], 0.0)
    np.testing.assert_allclose(q[1], 1.0)
    # round-half-even at exactly 0.5/127
    np.testing.assert_allclose(q[5], 0.0, atol=1e-9)


def test_masks():
    src = jnp.asarray([[5, 6, 2, 2]])
    m = np.array(L.make_src_mask(src))
    assert m.shape == (1, 1, 4)
    assert m[0, 0].tolist() == [True, True, False, False]

    tgt = jnp.asarray([[0, 7, 2]])
    tm = np.array(L.make_tgt_mask(tgt))
    assert tm.shape == (1, 3, 3)
    want = np.array(
        [[True, False, False], [True, True, False], [True, True, False]]
    )
    assert (tm[0] == want).all()


def test_attention_masking_and_softmax():
    q = jnp.ones((1, 1, 2, 4))
    k = jnp.ones((1, 1, 3, 4))
    v = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4))
    mask = jnp.asarray([[[[True, True, False], [True, True, False]]]])
    out = L.scaled_dot_attention(q, k, v, mask, quantize=False)
    # masked position 2 excluded; equal scores over 0,1 -> mean of rows 0,1
    want = np.array(v[0, 0, :2].mean(axis=0))
    np.testing.assert_allclose(np.array(out[0, 0, 0]), want, rtol=1e-5)


def test_tap_and_inject():
    taps = {}
    x = jnp.ones((2, 2))
    y = L.tap("a", x, taps, {"a": lambda t: t * 3})
    assert (np.array(y) == 3).all()
    assert (np.array(taps["a"]) == 3).all()


def test_dropout_train_eval():
    x = jnp.ones((1000,))
    assert (np.array(L.dropout(x, 0.5, None, train=False)) == 1).all()
    y = np.array(L.dropout(x, 0.5, jax.random.key(0), train=True))
    assert ((y == 0) | (np.isclose(y, 2.0))).all()
    assert 0.3 < (y == 0).mean() < 0.7


def test_xavier_uniform_bound():
    w = np.array(L.xavier_uniform(jax.random.key(0), (64, 256)))
    a = np.sqrt(6.0 / (64 + 256))
    assert np.abs(w).max() <= a
    assert np.abs(w).max() > 0.8 * a


def test_int8_cache_attention_matches_dequant_reference():
    """Scale-after-dot attention == dequantize-first attention (same math,
    reassociated), and the score/prob taps fire for the campaign seams."""
    import numpy as np
    from onnx_transformer_tpu.ops import layers as L

    rng = np.random.default_rng(4)
    b, h, t, d = 3, 4, 9, 32
    dk = d // h
    q = jnp.asarray(rng.normal(size=(b, h, 1, dk)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (b, t, d)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (b, t, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.05, (b, t, 1)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.05, (b, t, 1)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (b, 1, 1, t)).astype(bool)
                       | (np.arange(t) == 0)[None, None, None, :])

    taps = {}
    got = L.int8_cache_attention(q, kq, ks, vq, vs, mask, quantize=True,
                                 name="x", taps=taps)
    # dequant-first reference
    kf = L.split_heads(kq.astype(jnp.float32) * ks, h)
    vf = L.split_heads(vq.astype(jnp.float32) * vs, h)
    want = L.scaled_dot_attention(q, kf, vf, mask, quantize=True)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5, atol=1e-5)
    assert set(taps) == {"x.scores", "x.probs", "x.context"}
    assert taps["x.probs"].shape == (b, h, 1, t)

