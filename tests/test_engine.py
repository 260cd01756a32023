"""Continuous-batching engine tests: parity with batched greedy decode,
slot reuse with more requests than slots, EOS/length handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.serving import decode as D
from onnx_transformer_tpu.serving.engine import TranslationEngine


@pytest.fixture(scope="module")
def setup():
    cfg = TransformerConfig(
        src_vocab_size=31, tgt_vocab_size=29, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    m = Transformer(cfg)
    params = m.init(jax.random.key(5))
    rng = np.random.default_rng(2)
    S = 10
    srcs = rng.integers(4, 31, (9, S)).astype(np.int32)
    srcs[3, -4:] = 2
    srcs[7, -2:] = 2
    return m, params, srcs


def _greedy_reference(m, params, srcs, max_len):
    sm = jnp.asarray(L.make_src_mask(jnp.asarray(srcs)))
    ys = np.array(D.greedy_decode(m, params, jnp.asarray(srcs), sm, max_len))
    outs = []
    for row in ys:
        toks = []
        for t in row[1:]:
            if t == m.cfg.eos_id or t == m.cfg.pad_id:
                break
            toks.append(int(t))
        outs.append(toks)
    return outs


def test_engine_matches_batched_greedy(setup):
    m, params, srcs = setup
    max_len = 12
    want = _greedy_reference(m, params, srcs, max_len)
    eng = TranslationEngine(m, params, num_slots=4, src_len=srcs.shape[1],
                            max_len=max_len, chunk_steps=3)
    ids = [eng.submit(s) for s in srcs]
    done = eng.run()
    assert len(done) == len(srcs)
    got = {r.req_id: r.out_tokens for r in done}
    for rid, want_toks in zip(ids, want):
        assert got[rid] == want_toks, (rid, got[rid], want_toks)


def test_engine_more_requests_than_slots_reuses_slots(setup):
    m, params, srcs = setup
    eng = TranslationEngine(m, params, num_slots=2, src_len=srcs.shape[1],
                            max_len=8, chunk_steps=2)
    for s in srcs:
        eng.submit(s)
    done = eng.run()
    assert len(done) == len(srcs)
    assert all(r.done for r in done)
    assert all(len(r.out_tokens) <= 7 for r in done)


def test_engine_incremental_submission(setup):
    m, params, srcs = setup
    max_len = 10
    eng = TranslationEngine(m, params, num_slots=3, src_len=srcs.shape[1],
                            max_len=max_len, chunk_steps=4)
    eng.submit(srcs[0])
    first = eng.run()
    assert len(first) == 1
    # engine reusable: submit a second wave afterwards
    eng.submit(srcs[1])
    eng.submit(srcs[2])
    second = eng.run()
    assert len(second) == 2
    want = _greedy_reference(m, params, srcs[:3], max_len)
    assert first[0].out_tokens == want[0]
    got = sorted(r.out_tokens for r in second)
    assert got == sorted(want[1:3])


def test_engine_int8_kv_cache_matches_fp_under_w8a8(setup):
    from onnx_transformer_tpu.quant import w8a8 as W

    m, params, srcs = setup
    payloads = W.quantize_model_params(m, params)
    lin8 = W.make_w8a8_linear_impl(payloads)
    kw = dict(num_slots=3, src_len=srcs.shape[1], max_len=10, chunk_steps=4)
    eng_fp = TranslationEngine(m, params, lin=lin8, **kw)
    eng_i8 = TranslationEngine(m, params, lin=lin8, kv_cache_dtype="int8", **kw)
    for s in srcs[:5]:
        eng_fp.submit(s)
        eng_i8.submit(s)
    out_fp = {r.req_id: r.out_tokens for r in eng_fp.run()}
    out_i8 = {r.req_id: r.out_tokens for r in eng_i8.run()}
    assert out_fp == out_i8


def test_engine_tp_mesh_matches_single_device(setup):
    """BASELINE config 5: the engine with weights + KV cache tensor-sharded
    over a `model` mesh axis must emit exactly the single-device outputs."""
    from onnx_transformer_tpu.parallel.mesh import make_mesh

    m, params, srcs = setup
    max_len = 12
    want = _greedy_reference(m, params, srcs, max_len)
    mesh = make_mesh(model=4)
    eng = TranslationEngine(m, params, num_slots=4, src_len=srcs.shape[1],
                            max_len=max_len, chunk_steps=3, mesh=mesh)
    # weights landed sharded over the model axis (out-features / 4 per shard)
    qw = eng.params["encoder"]["layers"][0]["self_attn"]["q"]["w"]
    assert {s.data.shape for s in qw.addressable_shards} == {(32, 8)}
    ids = [eng.submit(s) for s in srcs]
    done = eng.run()
    got = {r.req_id: r.out_tokens for r in done}
    for rid, want_toks in zip(ids, want):
        assert got[rid] == want_toks, (rid, got[rid], want_toks)


@pytest.mark.slow
def test_engine_fused_attn_int8_matches_jnp(setup):
    """Engine with int8 KV + the fused Pallas attention kernel must match
    the engine on the jnp int8 path (slots at heterogeneous positions
    exercise the per-row masks)."""
    from onnx_transformer_tpu.quant import w8a8 as W

    m, params, srcs = setup
    max_len = 12
    _, lin8 = W.quantize_transformer(m, params, mode="int8")

    def run(fused):
        eng = TranslationEngine(m, params, lin=lin8, num_slots=4,
                                src_len=srcs.shape[1], max_len=max_len,
                                chunk_steps=3, kv_cache_dtype="int8",
                                fused_attn=fused)
        ids = [eng.submit(s) for s in srcs]
        done = eng.run()
        return ids, {r.req_id: r.out_tokens for r in done}

    ids_j, got_j = run(False)
    ids_f, got_f = run(True)
    assert len(got_f) == len(srcs)
    for rid in ids_j:
        assert got_f[rid] == got_j[rid], (rid, got_f[rid], got_j[rid])


def test_engine_batched_prefill_matches_single(setup):
    """Admission batching (one encoder dispatch per prefill_chunk requests,
    padded entries dropped via out-of-bounds scatter) must be output-
    identical to one-at-a-time prefill."""
    m, params, srcs = setup
    max_len = 12

    def run(chunk):
        eng = TranslationEngine(m, params, num_slots=4, src_len=srcs.shape[1],
                                max_len=max_len, chunk_steps=3,
                                prefill_chunk=chunk)
        ids = [eng.submit(s) for s in srcs]
        done = eng.run()
        return ids, {r.req_id: r.out_tokens for r in done}

    ids1, got1 = run(1)
    ids4, got4 = run(4)
    ids9, got9 = run(9)  # > num_slots: clamped, padded groups exercised
    assert len(got1) == len(got4) == len(got9) == len(srcs)
    for r1, r4, r9 in zip(ids1, ids4, ids9):
        assert got1[r1] == got4[r4] == got9[r9]


def test_engine_bucketed_prefill_matches_full_length(setup):
    """Length-bucketed prefill (encode at the bucket length) must be output-
    identical to full-length prefill: masked pad positions contribute exact
    zeros to attention, so the encoder memory at real positions is bit-equal."""
    m, params, srcs = setup
    max_len = 12
    S = srcs.shape[1]

    def run(buckets):
        eng = TranslationEngine(m, params, num_slots=4, src_len=S,
                                max_len=max_len, chunk_steps=3,
                                prefill_chunk=4, buckets=buckets)
        ids = [eng.submit(s) for s in srcs]
        done = eng.run()
        return ids, {r.req_id: r.out_tokens for r in done}

    ids_full, got_full = run(None)
    ids_b, got_b = run((6, 8, S))
    assert len(got_b) == len(srcs)
    for rf, rb in zip(ids_full, ids_b):
        assert got_full[rf] == got_b[rb]


def test_engine_staging_ring_wraparound(setup):
    """More requests than the staging ring holds: the ring must wrap and
    every request still completes exactly once."""
    m, params, srcs = setup
    eng = TranslationEngine(m, params, num_slots=2, src_len=srcs.shape[1],
                            max_len=8, chunk_steps=2, prefill_chunk=2,
                            stage_capacity=3)
    ids = [eng.submit(s) for s in list(srcs) * 3]   # 27 requests, ring of 3
    done = eng.run()
    assert sorted(r.req_id for r in done) == sorted(ids)
    assert all(r.done for r in done)


@pytest.mark.slow
def test_engine_time_major_cache_matches_batch_major(setup):
    """Opt-in time-major self-KV ring must be output-identical to the
    default batch-major layout (same math, different storage order)."""
    from onnx_transformer_tpu.quant import w8a8 as W

    m, params, srcs = setup
    _, lin8 = W.quantize_transformer(m, params, mode="int8")

    def run(tm):
        eng = TranslationEngine(m, params, lin=lin8, num_slots=4,
                                src_len=srcs.shape[1], max_len=12,
                                chunk_steps=3, kv_cache_dtype="int8",
                                kv_time_major=tm)
        ids = [eng.submit(s) for s in srcs]
        return ids, {r.req_id: r.out_tokens for r in eng.run()}

    ids_b, got_b = run(False)
    ids_t, got_t = run(True)
    for rb_, rt in zip(ids_b, ids_t):
        assert got_b[rb_] == got_t[rt]


@pytest.mark.slow
def test_bucketed_fleet_matches_single_engine(setup):
    """Per-bucket pools must emit exactly the single full-length engine's
    outputs for every request whose source fits its bucket."""
    from onnx_transformer_tpu.serving.engine import BucketedEngineFleet

    m, params, srcs = setup
    S = srcs.shape[1]
    max_len = 12
    single = TranslationEngine(m, params, num_slots=4, src_len=S,
                               max_len=max_len, chunk_steps=3)
    fleet = BucketedEngineFleet(m, params,
                                pools=((6, 2, max_len), (8, 3, max_len),
                                       (S, 4, max_len)),
                                chunk_steps=3)
    ids_s = [single.submit(s) for s in srcs]
    ids_f = [fleet.submit(s) for s in srcs]
    got_s = {r.req_id: r.out_tokens for r in single.run()}
    got_f = {r.req_id: r.out_tokens for r in fleet.run()}
    assert len(got_f) == len(srcs)
    for a, b in zip(ids_s, ids_f):
        assert got_s[a] == got_f[b], (a, b, got_s[a], got_f[b])


@pytest.mark.slow
def test_engine_chaos_small_rings_interleaved_waves(setup):
    """Property test: tiny slot pool + tiny staging ring + tiny completion
    cadence, requests submitted in interleaved waves — every request must
    complete exactly once with the lockstep-greedy tokens."""
    m, params, srcs = setup
    S = srcs.shape[1]
    max_len = 10
    want = _greedy_reference(m, params, np.concatenate([srcs] * 3), max_len)
    eng = TranslationEngine(m, params, num_slots=3, src_len=S,
                            max_len=max_len, chunk_steps=2, prefill_chunk=2,
                            stage_capacity=4, buckets=(7, S))
    got = {}
    ids = []
    rng = np.random.default_rng(0)
    pool = list(np.concatenate([srcs] * 3))
    while pool or len(got) < len(ids):
        wave = min(len(pool), int(rng.integers(1, 7)))
        for _ in range(wave):
            ids.append(eng.submit(pool.pop(0)))
        for r in eng.run(pipeline_depth=2, drain_every=2):
            assert r.req_id not in got, "duplicate completion"
            got[r.req_id] = r.out_tokens
    assert len(got) == len(ids) == 27
    for rid, toks in zip(ids, want):
        assert got[rid] == toks


def test_fast_chunk_path_matches_lockstep_int8():
    """The chunk-staged fast engine path (int8 + payloads, single chip)
    must produce the same outputs as lockstep greedy decode."""
    import onnx_transformer_tpu.quant.w8a8 as W8

    cfg = TransformerConfig(
        src_vocab_size=37, tgt_vocab_size=31, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    m = Transformer(cfg)
    sp, lin8 = W8.quantize_transformer(m, m.init(jax.random.key(11)), mode="int8")
    rng = np.random.default_rng(3)
    S, T = 8, 12
    src = rng.integers(4, 37, (10, S)).astype(np.int32)
    src[2, -3:] = cfg.pad_id
    eng = TranslationEngine(m, sp, lin=lin8, num_slots=4, src_len=S,
                            max_len=T, chunk_steps=3, kv_cache_dtype="int8")
    assert eng._stacked is not None, "fast path not engaged"
    for row in src:
        eng.submit(row)
    done = {r.req_id: r for r in eng.run()}
    sm = L.make_src_mask(jnp.asarray(src), pad=cfg.pad_id)
    ys = np.array(D.greedy_decode(m, sp, jnp.asarray(src), sm, T, lin=lin8,
                                  kv_cache_dtype="int8"))
    for i in range(len(src)):
        exp = []
        for t in ys[i, 1:]:
            if t in (cfg.eos_id, cfg.pad_id):
                break
            exp.append(int(t))
        exp = exp[: T - 1]  # engine kill rule caps output length
        assert done[i].out_tokens == exp, (i, done[i].out_tokens, exp)


@pytest.mark.slow
def test_int4_impl_uses_general_path():
    """W4A8 payloads carry 'wq_packed' (and different numerics): the engine
    must NOT engage the int8 fast chunk path, and must still serve
    correctly via the general path (code-review r4 finding)."""
    from onnx_transformer_tpu.quant.int4 import (
        make_w4a8_linear_impl, quantize_model_params_int4)

    cfg = TransformerConfig(
        src_vocab_size=37, tgt_vocab_size=31, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    m = Transformer(cfg)
    params = m.init(jax.random.key(4))
    lin4 = make_w4a8_linear_impl(quantize_model_params_int4(m, params),
                                 fused=False)
    rng = np.random.default_rng(5)
    S, T = 8, 12
    src = rng.integers(4, 37, (6, S)).astype(np.int32)
    eng = TranslationEngine(m, params, lin=lin4, num_slots=4, src_len=S,
                            max_len=T, chunk_steps=3, kv_cache_dtype="int8")
    assert eng._stacked is None, "int4 impl must not use the int8 fast path"
    for row in src:
        eng.submit(row)
    done = {r.req_id: r for r in eng.run()}
    sm = L.make_src_mask(jnp.asarray(src), pad=cfg.pad_id)
    ys = np.array(D.greedy_decode(m, params, jnp.asarray(src), sm, T,
                                  lin=lin4, kv_cache_dtype="int8"))
    for i in range(len(src)):
        exp = []
        for t in ys[i, 1:]:
            if t in (cfg.eos_id, cfg.pad_id):
                break
            exp.append(int(t))
        assert done[i].out_tokens == exp[: T - 1], (i, done[i].out_tokens)


# ---------------------------------------------------------------- beam mode

def _beam_reference(m, params, srcs, max_len, k=4, lin=None, kv="fp32"):
    """Lockstep beam_decode best hypotheses, trimmed like engine outputs."""
    from onnx_transformer_tpu.models.transformer import default_linear

    sm = jnp.asarray(L.make_src_mask(jnp.asarray(srcs)))
    ys = np.array(D.beam_decode(m, params, jnp.asarray(srcs), sm, max_len,
                                beam_size=k, lin=lin or default_linear,
                                kv_cache_dtype=kv))
    outs = []
    for row in ys:
        toks = []
        for t in row[1:]:
            if t == m.cfg.eos_id or t == m.cfg.pad_id:
                break
            toks.append(int(t))
        outs.append(toks)
    return outs


def test_engine_beam_matches_lockstep_beam(setup):
    """Slot-group beam engine (K slots per request, ancestry-gathered
    self-KV ring) must reproduce the lockstep beam_decode best hypothesis
    per request — the engine-beam output-identity oracle (VERDICT r4 #5;
    the reference has no beam at all, greedy_decoding.py:6-19)."""
    m, params, srcs = setup
    max_len = 12
    K = 4
    want = _beam_reference(m, params, srcs, max_len, k=K)
    eng = TranslationEngine(m, params, num_slots=2 * K, src_len=srcs.shape[1],
                            max_len=max_len, chunk_steps=3, beam_size=K)
    ids = [eng.submit(s) for s in srcs]
    done = eng.run()
    assert len(done) == len(srcs)
    got = {r.req_id: r.out_tokens for r in done}
    for rid, want_toks in zip(ids, want):
        assert got[rid] == want_toks, (rid, got[rid], want_toks)


@pytest.mark.slow
def test_engine_beam_int8_matches_lockstep_beam(setup):
    """Beam engine on the int8-KV cache path with a W8A8 impl."""
    from onnx_transformer_tpu.quant import w8a8 as W

    m, params, srcs = setup
    max_len = 12
    K = 3
    sp, lin8 = W.quantize_transformer(m, params, mode="int8")
    want = _beam_reference(m, sp, srcs, max_len, k=K, lin=lin8, kv="int8")
    eng = TranslationEngine(m, sp, lin=lin8, num_slots=3 * K,
                            src_len=srcs.shape[1], max_len=max_len,
                            chunk_steps=4, kv_cache_dtype="int8", beam_size=K)
    ids = [eng.submit(s) for s in srcs]
    done = eng.run()
    got = {r.req_id: r.out_tokens for r in done}
    for rid, want_toks in zip(ids, want):
        assert got[rid] == want_toks, (rid, got[rid], want_toks)


def test_engine_beam_more_requests_than_groups(setup):
    """Group reuse: more requests than beam groups completes them all."""
    m, params, srcs = setup
    eng = TranslationEngine(m, params, num_slots=4, src_len=srcs.shape[1],
                            max_len=8, chunk_steps=2, beam_size=2)
    for s in srcs:
        eng.submit(s)
    done = eng.run()
    assert len(done) == len(srcs)
    assert all(r.done and len(r.out_tokens) <= 7 for r in done)


def test_complete_harvest_remainder_fetch(setup):
    """When the sized harvest fetch undercounts, the remainder rows must be
    fetched exactly from the retained device report (no completion lost)."""
    m, params, srcs = setup
    eng = TranslationEngine(m, params, num_slots=4, src_len=srcs.shape[1],
                            max_len=8, chunk_steps=2)
    full = jnp.asarray(np.arange(9 * 7, dtype=np.int32).reshape(9, 7))
    full = full.at[0, 0].set(6)       # header says 6 completions
    rep = np.asarray(full[:4])        # fetch sized to only 3 rows
    out = eng._complete_harvest(rep, [full])
    assert out.shape[0] == 7          # header + 6 rows
    np.testing.assert_array_equal(out, np.asarray(full[:7]))
    # exact-size fetch: no extra fetch, report unchanged
    rep2 = np.asarray(full[:7])
    out2 = eng._complete_harvest(rep2, [full])
    np.testing.assert_array_equal(out2, rep2)


def test_backpressure_gates_refills_but_loses_nothing(setup):
    """A deliberately tiny completion buffer must engage the refill
    backpressure (gated counter > 0) without ever losing a completion."""
    m, params, srcs = setup
    eng = TranslationEngine(m, params, num_slots=4, src_len=srcs.shape[1],
                            max_len=8, chunk_steps=2,
                            comp_capacity=16)   # tiny: room = cur < 16-8
    for s in list(srcs) * 3:                    # 27 requests through 4 slots
        eng.submit(s)
    done = eng.run(drain_every=8)               # lazy drains -> pressure
    assert len(done) == 3 * len(srcs)
    assert all(r.done for r in done)
