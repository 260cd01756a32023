"""Decode tests: KV-cache vs full-redecode parity (the reference's dual
qonnx-vs-ORT executor oracle, SURVEY.md §4), EOS handling, beam search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.serving import decode as D


@pytest.fixture(scope="module")
def small():
    cfg = TransformerConfig(
        src_vocab_size=31, tgt_vocab_size=29, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    m = Transformer(cfg)
    params = m.init(jax.random.key(3))
    return m, params


def _src(b=4, s=9, sv=31, seed=1):
    rng = np.random.default_rng(seed)
    src = rng.integers(4, sv, (b, s)).astype(np.int32)
    src[1, -3:] = 2
    return jnp.asarray(src), L.make_src_mask(jnp.asarray(src))


@pytest.mark.slow
def test_cached_greedy_matches_nocache_reference(small):
    m, params = small
    src, sm = _src()
    max_len = 12
    ys_nc = np.array(D.greedy_decode_nocache(m, params, src, sm, max_len))
    ys_c = np.array(D.greedy_decode(m, params, src, sm, max_len, stop_at_eos=False))
    np.testing.assert_array_equal(ys_c, ys_nc)


def test_greedy_jit_compiles_and_matches(small):
    m, params = small
    src, sm = _src()
    ys_eager = np.array(D.greedy_decode(m, params, src, sm, 10))
    ys_jit = np.array(D.greedy_decode_jit(m, params, (src, sm), 10, 0))
    np.testing.assert_array_equal(ys_eager, ys_jit)


def test_eos_early_stop_pads_after_eos(small):
    m, params = small
    src, sm = _src()
    ys = np.array(D.greedy_decode(m, params, src, sm, 14, stop_at_eos=True))
    for row in ys:
        seen_eos = False
        for t in row[1:]:
            if seen_eos:
                assert t == m.cfg.pad_id
            if t == m.cfg.eos_id:
                seen_eos = True


def test_beam_size_1_equals_greedy(small):
    m, params = small
    src, sm = _src()
    ys_g = np.array(D.greedy_decode(m, params, src, sm, 10, stop_at_eos=True))
    ys_b = np.array(D.beam_decode(m, params, src, sm, 10, beam_size=1))
    np.testing.assert_array_equal(ys_b, ys_g)


@pytest.mark.slow
def test_beam_score_not_worse_than_greedy(small):
    """Beam-4's model score (sum log p of emitted tokens) must be >= greedy's."""
    m, params = small
    src, sm = _src(b=2)
    max_len = 10

    def score(ys):
        ys = jnp.asarray(ys)
        mem = m.encode(params, src, sm)
        total = np.zeros(ys.shape[0])
        cache = m.init_cache(params, mem, max_len)
        for i in range(max_len - 1):
            logp, cache = m.decode_step(params, cache, ys[:, i][:, None], i, sm)
            nxt = np.array(ys[:, i + 1])
            alive = nxt != m.cfg.pad_id
            total += np.where(alive, np.array(logp)[np.arange(ys.shape[0]), nxt], 0.0)
        return total

    s_g = score(np.array(D.greedy_decode(m, params, src, sm, max_len)))
    s_b = score(np.array(D.beam_decode(m, params, src, sm, max_len, beam_size=4)))
    assert (s_b >= s_g - 1e-4).all()


def test_ids_to_tokens_cuts_at_eos():
    class V:
        itos = ["<s>", "</s>", "<blank>", "<unk>", "a", "b"]

    ids = np.array([[0, 4, 5, 1, 4], [0, 5, 2, 5, 1]])
    toks = D.ids_to_tokens(ids, V())
    assert toks[0] == ["a", "b"]
    assert toks[1] == ["b", "b"]


def test_int8_kv_cache_lossless_under_w8a8(small):
    """With the W8A8 linear impl, k/v already sit on the per-token int8 grid,
    so the int8 KV cache must reproduce fp32-cache decode exactly."""
    from onnx_transformer_tpu.quant import w8a8 as W

    m, params = small
    src, sm = _src()
    payloads = W.quantize_model_params(m, params)
    lin8 = W.make_w8a8_linear_impl(payloads)
    ys_fp = np.array(D.greedy_decode(m, params, src, sm, 10, lin=lin8))
    ys_i8 = np.array(D.greedy_decode(m, params, src, sm, 10, lin=lin8,
                                     kv_cache_dtype="int8"))
    np.testing.assert_array_equal(ys_i8, ys_fp)


def test_int8_kv_cache_fp_model_close(small):
    """For the unquantized model the int8 cache is an approximation; decode
    must run and mostly agree with the fp cache."""
    m, params = small
    src, sm = _src()
    ys_fp = np.array(D.greedy_decode(m, params, src, sm, 12))
    ys_i8 = np.array(D.greedy_decode(m, params, src, sm, 12, kv_cache_dtype="int8"))
    agreement = (ys_fp == ys_i8).mean()
    assert agreement > 0.7, agreement


def test_int8_kv_cache_beam_runs(small):
    m, params = small
    src, sm = _src(b=2)
    ys = np.array(D.beam_decode(m, params, src, sm, 8, beam_size=2,
                                kv_cache_dtype="int8"))
    assert ys.shape == (2, 8)


def test_early_exit_matches_scan_decode(small):
    m, params = small
    src, sm = _src()
    ys_scan = np.array(D.greedy_decode(m, params, src, sm, 12))
    ys_we = np.array(D.greedy_decode_early_exit(m, params, src, sm, 12))
    np.testing.assert_array_equal(ys_we, ys_scan)


def test_greedy_time_major_cache_matches_batch_major(small):
    """kv_time_major=True greedy decode (int8 cache, W8A8 impl) emits the
    same trajectories as the default batch-major layout."""
    from onnx_transformer_tpu.quant import w8a8 as W

    m, params = small
    _, lin8 = W.quantize_transformer(m, params, mode="int8")
    src, sm = _src()
    kw = dict(lin=lin8, kv_cache_dtype="int8")
    a = np.array(D.greedy_decode(m, params, src, sm, 12, **kw))
    b = np.array(D.greedy_decode(m, params, src, sm, 12,
                                 kv_time_major=True, **kw))
    assert (a == b).all()
