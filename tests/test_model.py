"""Transformer model tests: shapes, tap inventory, determinism, KV cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.ops import layers as L


@pytest.fixture(scope="module")
def small():
    cfg = TransformerConfig(
        src_vocab_size=53, tgt_vocab_size=47, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.1,
    )
    m = Transformer(cfg)
    params = m.init(jax.random.key(0))
    return m, params


def _batch(b=3, s=7, t=5, sv=53, tv=47, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(4, sv, (b, s)).astype(np.int32)
    src[0, -2:] = 2
    tgt_in = rng.integers(4, tv, (b, t)).astype(np.int32)
    return (
        jnp.asarray(src),
        jnp.asarray(tgt_in),
        L.make_src_mask(jnp.asarray(src)),
        L.make_tgt_mask(jnp.asarray(tgt_in)),
    )


def test_forward_shapes_and_logprobs(small):
    m, params = small
    src, tgt_in, sm, tm = _batch()
    h = m.forward(params, src, tgt_in, sm, tm)
    assert h.shape == (3, 5, 32)
    logp = m.generate(params, h)
    assert logp.shape == (3, 5, 47)
    np.testing.assert_allclose(np.array(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-5)


def test_tap_inventory_matches_reference_linear_count(small):
    """The calibration hooks of the reference record one tensor per nn.Linear
    input: per layer — 4 attn + 2 ffn in the encoder, 8 attn + 2 ffn in the
    decoder (get_quantized_scales.py:144-148; 96 total at N=6)."""
    m, params = small
    src, tgt_in, sm, tm = _batch()
    taps = {}
    m.forward(params, src, tgt_in, sm, tm, taps=taps)
    n = m.cfg.num_layers
    lin_inputs = [k for k in taps if "linears." in k and not k.endswith(".out")]
    ffn_inputs = [k for k in taps if "feed_forward.w" in k and not k.endswith(".out")]
    assert len(lin_inputs) == n * 4 + n * 8
    assert len(ffn_inputs) == n * 2 * 2
    # at N=6 this would be 96 = the reference scale-file entry count
    assert "encoder.layers.0.self_attn.linears.0" in taps
    assert "decoder.layers.1.src_attn.linears.3" in taps


def test_forward_deterministic_in_eval(small):
    m, params = small
    src, tgt_in, sm, tm = _batch()
    h1 = m.forward(params, src, tgt_in, sm, tm)
    h2 = m.forward(params, src, tgt_in, sm, tm)
    np.testing.assert_array_equal(np.array(h1), np.array(h2))


def test_dropout_changes_training_forward(small):
    m, params = small
    src, tgt_in, sm, tm = _batch()
    h1 = m.forward(params, src, tgt_in, sm, tm, rng=jax.random.key(1), train=True)
    h2 = m.forward(params, src, tgt_in, sm, tm, rng=jax.random.key(2), train=True)
    assert not np.allclose(np.array(h1), np.array(h2))


def test_injection_changes_output(small):
    m, params = small
    src, tgt_in, sm, tm = _batch()
    base = m.forward(params, src, tgt_in, sm, tm)
    inj = {"encoder.layers.0.self_attn.linears.0": lambda x: x * 0.0}
    hurt = m.forward(params, src, tgt_in, sm, tm, inject=inj)
    assert not np.allclose(np.array(base), np.array(hurt))


def test_prob_quantization_flag(small):
    m, params = small
    src, tgt_in, sm, tm = _batch()
    taps = {}
    m.encode(params, src, sm, taps=taps)
    p = np.array(taps["encoder.layers.0.self_attn.probs"])
    frac = p * 127 - np.round(p * 127)
    assert np.abs(frac).max() < 1e-4  # probs on the 1/127 grid

    m2 = Transformer(m.cfg.with_(quantize_attn_probs=False))
    taps2 = {}
    m2.encode(params, src, sm, taps=taps2)
    p2 = np.array(taps2["encoder.layers.0.self_attn.probs"])
    frac2 = p2 * 127 - np.round(p2 * 127)
    assert np.abs(frac2).max() > 1e-4


def test_padding_invariance_of_encoding(small):
    """Masked (pad) source positions must not affect unmasked outputs."""
    m, params = small
    src, _, sm, _ = _batch()
    mem1 = m.encode(params, src, sm)
    src2 = np.array(src)
    src2[0, -2:] = 7  # change content of *masked* positions
    # keep original mask (positions still masked)
    mem2 = m.encode(params, jnp.asarray(src2), sm)
    np.testing.assert_allclose(
        np.array(mem1[0, :-2]), np.array(mem2[0, :-2]), atol=2e-5
    )


def test_scan_layers_parity(small):
    """Scanned layer stack must match the unrolled path exactly (same math,
    ~6x smaller XLA graph)."""
    m, params = small
    src, tgt_in, sm, tm = _batch()
    h_unrolled = m.forward(params, src, tgt_in, sm, tm)
    m_scan = Transformer(m.cfg.with_(scan_layers=True))
    h_scan = m_scan.forward(params, src, tgt_in, sm, tm)
    np.testing.assert_allclose(np.array(h_scan), np.array(h_unrolled), rtol=2e-5, atol=2e-5)
    # taps force the unrolled fallback and still work
    taps = {}
    h_tap = m_scan.forward(params, src, tgt_in, sm, tm, taps=taps)
    assert len(taps) > 0
    np.testing.assert_allclose(np.array(h_tap), np.array(h_unrolled), rtol=2e-5, atol=2e-5)


def test_scan_layers_train_mode_runs(small):
    m, params = small
    src, tgt_in, sm, tm = _batch()
    m_scan = Transformer(m.cfg.with_(scan_layers=True))
    h = m_scan.forward(params, src, tgt_in, sm, tm, rng=jax.random.key(0), train=True)
    assert np.isfinite(np.array(h)).all()
