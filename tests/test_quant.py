"""Quantization tests: absmax primitives vs reference semantics, SmoothQuant
invariance, W8A8 model parity (fake vs int8 modes), calibration, INT4 pack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import core as Q
from onnx_transformer_tpu.quant import w8a8 as W
from onnx_transformer_tpu.quant.calibrate import get_act_scales, _linear_input_names
from onnx_transformer_tpu.quant.smoothquant import smooth_ln_fcs, smooth_params


@pytest.fixture(scope="module")
def small():
    cfg = TransformerConfig(
        src_vocab_size=41, tgt_vocab_size=37, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    m = Transformer(cfg)
    params = m.init(jax.random.key(11))
    return m, params


def _batch(b=3, s=7, t=5, sv=41, tv=37, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(4, sv, (b, s)).astype(np.int32)
    tgt_in = rng.integers(4, tv, (b, t)).astype(np.int32)
    return (
        jnp.asarray(src), jnp.asarray(tgt_in),
        L.make_src_mask(jnp.asarray(src)), L.make_tgt_mask(jnp.asarray(tgt_in)),
    )


# ------------------------------------------------------------------ core

def test_weight_per_channel_matches_reference_fake_quant():
    # quant_linear.py:5-17 on torch (out,in); ours is (in,out)
    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 8)).astype(np.float32)  # (in, out)
    wq, s = Q.quantize_weight_per_channel(jnp.asarray(w))
    # reference math per out-channel j: scale = clamp(max|w[:,j]|,1e-5)/127
    want_s = np.maximum(np.abs(w).max(0), 1e-5) / 127
    np.testing.assert_allclose(np.array(s), want_s, rtol=1e-6)
    fake = np.array(Q.dequantize(wq, s[None, :]))
    want = np.round(w / want_s[None, :]) * want_s[None, :]
    np.testing.assert_allclose(fake, want, rtol=1e-5, atol=1e-7)
    assert np.abs(np.array(wq)).max() <= 127


def test_act_per_token_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 5, 8)).astype(np.float32) * 3
    fake = np.array(Q.fake_quant_act_per_token(jnp.asarray(x)))
    s = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-5) / 127
    want = np.round(x / s) * s
    np.testing.assert_allclose(fake, want, rtol=1e-5, atol=1e-7)


def test_scale_floor_clamp():
    x = jnp.zeros((2, 4))
    q, s = Q.quantize_act_per_token(x)
    np.testing.assert_allclose(np.array(s), 1e-5 / 127)
    assert (np.array(q) == 0).all()


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.integers(-8, 8, size=(16, 6)).astype(np.int8)
    packed = Q.pack_int4(jnp.asarray(q))
    assert packed.shape == (8, 6)
    np.testing.assert_array_equal(np.array(Q.unpack_int4(packed)), q)


def test_ste_round_gradient_passthrough():
    g = jax.grad(lambda x: jnp.sum(Q.ste_round(x * 3.0)))(jnp.ones(4))
    np.testing.assert_allclose(np.array(g), 3.0)


# ------------------------------------------------------------ smoothquant

def test_smooth_ln_fcs_preserves_function():
    """LN -> linear composite must be numerically unchanged by migration
    (get_quantized_model.py:10-36)."""
    rng = np.random.default_rng(3)
    d, out = 16, 12
    ln = {"scale": jnp.asarray(rng.normal(size=d).astype(np.float32)),
          "bias": jnp.asarray(rng.normal(size=d).astype(np.float32))}
    fc = {"w": jnp.asarray(rng.normal(size=(d, out)).astype(np.float32)),
          "b": jnp.asarray(rng.normal(size=out).astype(np.float32))}
    act = jnp.asarray(np.abs(rng.normal(size=d)).astype(np.float32) + 0.1)
    x = jnp.asarray(rng.normal(size=(5, d)).astype(np.float32))

    before = L.linear(L.layer_norm(x, ln["scale"], ln["bias"]), fc["w"], fc["b"])
    new_ln, (new_fc,) = smooth_ln_fcs(ln, [fc], act)
    after = L.linear(L.layer_norm(x, new_ln["scale"], new_ln["bias"]), new_fc["w"], new_fc["b"])
    np.testing.assert_allclose(np.array(after), np.array(before), rtol=2e-4, atol=2e-5)


def test_smooth_ln_fcs_scale_formula():
    ln = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
    w = jnp.asarray([[1.0, 2, 1, 1], [4, 1, 1, 1], [2, 1, 1, 1], [1, 1, 1, 1]]).T  # (in=4,out=4)
    fc = {"w": w, "b": jnp.zeros(4)}
    act = jnp.asarray([4.0, 9.0, 1.0, 1e-9])
    new_ln, (new_fc,) = smooth_ln_fcs(ln, [fc], act, alpha=0.5)
    w_scales = np.array([4.0, 2.0, 1.0, 1.0])  # per in-feature max |w[in, :]|
    want = np.maximum(np.sqrt(np.array([4.0, 9.0, 1.0, 1e-9])) / np.sqrt(w_scales), 1e-5)
    # s = act_scales ** 0.5 / weight_scales ** 0.5 ; ln scale divided by s
    np.testing.assert_allclose(np.array(1.0 / new_ln["scale"]), want, rtol=1e-5)


def _random_scales(m, d=32, seed=7):
    scales = {}
    for name in _linear_input_names(m):
        if name.endswith("linears.0") or name.endswith("w_1"):
            scales[name] = (
                np.abs(np.random.default_rng(seed).normal(size=d)).astype(np.float32) + 0.05
            )
    return scales


def test_smooth_params_default_preserves_full_forward(small):
    """Default migration must leave the whole model function unchanged —
    including cross-attention, where only the q projection (the consumer of
    the smoothed LN output) is scaled."""
    m, params = small
    src, tgt_in, sm, tm = _batch()
    before = m.forward(params, src, tgt_in, sm, tm)
    smoothed = smooth_params(params, _random_scales(m))
    after = m.forward(smoothed, src, tgt_in, sm, tm)
    np.testing.assert_allclose(np.array(after), np.array(before), rtol=5e-3, atol=5e-4)
    w0 = params["encoder"]["layers"][0]["self_attn"]["q"]["w"]
    w1 = smoothed["encoder"]["layers"][0]["self_attn"]["q"]["w"]
    assert not np.allclose(np.array(w0), np.array(w1))


def test_smooth_params_cross_attn_faithful_deviation(small):
    """faithful_cross_attn=True reproduces the reference bug: it migrates
    cross-attention k/v weights whose input is the (unsmoothed) encoder
    memory (get_quantized_model.py:127-138) — the function there changes."""
    m, params = small
    src, tgt_in, sm, tm = _batch()
    before = m.forward(params, src, tgt_in, sm, tm)
    smoothed = smooth_params(params, _random_scales(m), faithful_cross_attn=True)
    after = m.forward(smoothed, src, tgt_in, sm, tm)
    assert not np.allclose(np.array(after), np.array(before), rtol=5e-3, atol=5e-4)
    # encoder side is unchanged either way
    np.testing.assert_allclose(np.array(m.encode(smoothed, src, sm)),
                               np.array(m.encode(params, src, sm)),
                               rtol=5e-3, atol=5e-4)


# ------------------------------------------------------------- calibration

def test_calibration_produces_reference_shaped_scales(small):
    m, params = small

    class B:
        def __init__(self):
            src, tgt_in, sm, tm = _batch(seed=np.random.randint(1 << 30))
            self.src, self.tgt_in, self.src_mask, self.tgt_mask = src, tgt_in, sm, tm

    scales = get_act_scales(m, params, [B() for _ in range(3)], jit=False)
    n = m.cfg.num_layers
    assert len(scales) == n * 6 + n * 10  # 96 at N=6
    assert scales["encoder.layers.0.self_attn.linears.0"].shape == (32,)
    assert scales["encoder.layers.0.feed_forward.w_2"].shape == (64,)
    # relu outputs can have all-zero channels over a small sample, so >= 0
    # (the reference doesn't clamp at calibration time either; clamping
    # happens in smooth_ln_fcs / quantize)
    assert all(np.isfinite(v).all() and (v >= 0).all() for v in scales.values())
    assert any((v > 0).any() for v in scales.values())


def test_calibration_running_max(small):
    m, params = small

    class B:
        def __init__(self, seed):
            src, tgt_in, sm, tm = _batch(seed=seed)
            self.src, self.tgt_in, self.src_mask, self.tgt_mask = src, tgt_in, sm, tm

    s1 = get_act_scales(m, params, [B(1)], jit=False)
    s2 = get_act_scales(m, params, [B(2)], jit=False)
    s12 = get_act_scales(m, params, [B(1), B(2)], jit=False)
    for k in s12:
        np.testing.assert_allclose(s12[k], np.maximum(s1[k], s2[k]), rtol=1e-6)


# ------------------------------------------------------------------- w8a8

def test_w8a8_fake_mode_matches_manual_reference(small):
    """fake mode must equal hand-computed fake-quant linear chain."""
    m, params = small
    payloads = W.quantize_model_params(m, params)
    lin = W.make_w8a8_linear_impl(payloads, mode="fake")
    name = "encoder.layers.0.self_attn.linears.0"
    x = jnp.asarray(np.random.default_rng(9).normal(size=(3, 5, 32)).astype(np.float32))
    got = lin(name, x, None, None)
    leaf = params["encoder"]["layers"][0]["self_attn"]["q"]
    qx = np.array(Q.fake_quant_act_per_token(x))
    qw = np.array(Q.fake_quant_weight_per_channel(jnp.asarray(leaf["w"])))
    y = qx @ qw + np.array(leaf["b"])
    want = np.array(Q.fake_quant_act_per_token(jnp.asarray(y)))  # qout=True
    np.testing.assert_allclose(np.array(got), want, rtol=1e-5, atol=1e-6)


def test_w8a8_int8_mode_close_to_fake_mode(small):
    """Real int8 accumulation == fp fake-quant up to fp32 rounding."""
    m, params = small
    payloads = W.quantize_model_params(m, params)
    lin8 = W.make_w8a8_linear_impl(payloads, mode="int8")
    linf = W.make_w8a8_linear_impl(payloads, mode="fake")
    src, tgt_in, sm, tm = _batch()
    h8 = m.forward(params, src, tgt_in, sm, tm, lin=lin8)
    hf = m.forward(params, src, tgt_in, sm, tm, lin=linf)
    np.testing.assert_allclose(np.array(h8), np.array(hf), rtol=1e-3, atol=1e-3)


def test_w8a8_unquantized_names_fall_through(small):
    m, params = small
    payloads = W.quantize_model_params(m, params)
    lin = W.make_w8a8_linear_impl(payloads)
    g = params["generator"]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32)).astype(np.float32))
    got = lin("generator.proj", x, g["w"], g["b"])
    np.testing.assert_allclose(np.array(got), np.array(L.linear(x, g["w"], g["b"])), rtol=1e-6)


def test_quantized_model_output_close_to_fp32(small):
    """PTQ BLEU-parity proxy: hidden states stay close on a well-conditioned
    random model."""
    m, params = small
    src, tgt_in, sm, tm = _batch()
    base = m.forward(params, src, tgt_in, sm, tm)

    class B:
        def __init__(self):
            self.src, self.tgt_in, self.src_mask, self.tgt_mask = src, tgt_in, sm, tm

    scales = get_act_scales(m, params, [B()], jit=False)
    sp, lin = W.quantize_transformer(m, params, scales)
    hq = m.forward(sp, src, tgt_in, sm, tm, lin=lin)
    assert np.isfinite(np.array(hq)).all()
    # encoder side (true invariance region) must be much tighter
    eq = m.encode(sp, src, sm, lin=lin)
    eb = m.encode(params, src, sm)
    err_e = np.abs(np.array(eq) - np.array(eb)).mean() / np.abs(np.array(eb)).mean()
    assert err_e < 0.12, err_e


def test_int_domain_injection_seam(small):
    """Bit-level faults must be injectable on the int8 operand (the
    reference's pre-dequant DequantizeLinear flip, inject_utils/layers.py:87)."""
    m, params = small
    payloads = W.quantize_model_params(m, params)

    def flip_msb(q):
        return (q.astype(jnp.int32) ^ 64).astype(jnp.int8)  # flip bit 6

    inj = {"encoder.layers.0.self_attn.linears.0.x_q": flip_msb}
    lin = W.make_w8a8_linear_impl(payloads)
    src, tgt_in, sm, tm = _batch()
    clean = m.forward(params, src, tgt_in, sm, tm, lin=lin)
    faulty = m.forward(params, src, tgt_in, sm, tm, lin=lin, inject=inj)
    assert not np.allclose(np.array(clean), np.array(faulty))


# ------------------------------------------------------------------- int4

def test_w4a8_matches_fake_quant_reference(small):
    from onnx_transformer_tpu.quant.int4 import (
        make_w4a8_linear_impl, quantize_model_params_int4)
    m, params = small
    payloads = quantize_model_params_int4(m, params)
    lin4 = make_w4a8_linear_impl(payloads)
    name = "encoder.layers.0.feed_forward.w_1"
    x = jnp.asarray(np.random.default_rng(13).normal(size=(2, 4, 32)).astype(np.float32))
    got = np.array(lin4(name, x, None, None))
    leaf = params["encoder"]["layers"][0]["ffn"]["w1"]
    w = np.array(leaf["w"])
    sw = np.maximum(np.abs(w).max(0), 1e-5) / 7
    wq = np.clip(np.round(w / sw), -7, 7)
    qx = np.array(Q.fake_quant_act_per_token(x))
    want = qx @ (wq * sw) + np.array(leaf["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_qat_linear_impl_differentiable(small):
    from onnx_transformer_tpu.quant.int4 import make_qat_linear_impl
    m, params = small
    lin = make_qat_linear_impl(w_bits=4, a_bits=8)
    src, tgt_in, sm, tm = _batch()

    def loss(p):
        h = m.forward(p, src, tgt_in, sm, tm, lin=lin)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(params)
    gw = np.array(g["encoder"]["layers"][0]["self_attn"]["q"]["w"])
    assert np.isfinite(gw).all()
    assert np.abs(gw).max() > 0  # STE passes gradients through round()


def test_qat_then_deploy_int4_close(small):
    """QAT fake-quant forward ~ deployed packed-int4 forward."""
    from onnx_transformer_tpu.quant.int4 import (
        make_qat_linear_impl, make_w4a8_linear_impl, quantize_model_params_int4)
    m, params = small
    src, tgt_in, sm, tm = _batch()
    h_qat = m.forward(params, src, tgt_in, sm, tm, lin=make_qat_linear_impl())
    payloads = quantize_model_params_int4(m, params)
    h_dep = m.forward(params, src, tgt_in, sm, tm, lin=make_w4a8_linear_impl(payloads))
    np.testing.assert_allclose(np.array(h_dep), np.array(h_qat), rtol=2e-2, atol=2e-2)


def test_fused_w4a8_kernel_matches_xla_chain():
    """Packed-int4 Pallas kernel (VMEM nibble unpack) vs the XLA
    unpack-then-matmul chain: ulp-identical."""
    import numpy as _np
    from onnx_transformer_tpu.ops.pallas.w8a8_matmul import quant_w4a8_matmul
    from onnx_transformer_tpu.quant import core as Q

    rng = _np.random.default_rng(3)
    m, k, n = 24, 32, 64
    x = jnp.asarray(rng.normal(size=(m, k)).astype(_np.float32))
    w = rng.normal(size=(k, n)).astype(_np.float32)
    sw = Q.absmax_scale(jnp.asarray(w), axis=0, bits=4, keepdims=False)
    wq = Q.quantize(jnp.asarray(w), sw[None, :], bits=4, clip=True)
    packed = Q.pack_int4(wq)
    b = jnp.asarray(rng.normal(size=(n,)).astype(_np.float32))

    sx = Q.act_scale_per_token(x)
    xq = Q.quantize(x, sx)
    y32 = jax.lax.dot_general(xq, Q.unpack_int4(packed),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y_ref = y32.astype(jnp.float32) * (sx * sw[None, :]) + b[None, :]
    y_k = quant_w4a8_matmul(x, packed, sw, b)
    _np.testing.assert_allclose(_np.array(y_k), _np.array(y_ref),
                                atol=1e-4, rtol=1e-5)


@pytest.mark.slow
def test_w4a8_fused_impl_end_to_end_tokens():
    """Fused-kernel W4A8 impl vs the XLA impl: near-total token agreement."""
    import numpy as _np
    from onnx_transformer_tpu.quant.int4 import (
        make_w4a8_linear_impl, quantize_model_params_int4)
    from onnx_transformer_tpu.serving import decode as D

    cfg = TransformerConfig(src_vocab_size=37, tgt_vocab_size=31,
                            num_layers=2, d_model=32, d_ff=64, num_heads=4,
                            dropout=0.0)
    m = Transformer(cfg)
    params = m.init(jax.random.key(2))
    pl4 = quantize_model_params_int4(m, params)
    lin_x = make_w4a8_linear_impl(pl4, fused=False)
    lin_f = make_w4a8_linear_impl(pl4, fused=True)
    rng = _np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 37, (6, 9)).astype(_np.int32))
    sm = L.make_src_mask(src)
    ys_x = _np.array(D.greedy_decode(m, params, src, sm, 10, lin=lin_x,
                                     kv_cache_dtype="int8"))
    # force the kernel path at test shapes (the gate reads the module global
    # at call time, so patching it here routes the 54-token prefill through
    # quant_w4a8_matmul)
    import onnx_transformer_tpu.quant.w8a8 as W8
    orig_min = W8.FUSED_MIN_TOKENS
    W8.FUSED_MIN_TOKENS = 1
    try:
        ys_f = _np.array(D.greedy_decode(m, params, src, sm, 10, lin=lin_f,
                                         kv_cache_dtype="int8"))
    finally:
        W8.FUSED_MIN_TOKENS = orig_min
    agree = _np.mean(ys_x == ys_f)
    assert agree >= 0.95, agree
