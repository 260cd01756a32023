"""Fault-injection tests: bit-flip primitive semantics vs struct-level
oracles, parameterised-fault campaign behavior (golden == clean, faults
perturb, CSV schema)."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onnx_transformer_tpu.inject import bits as B
from onnx_transformer_tpu.inject import campaign as C
from onnx_transformer_tpu.models.transformer import Transformer, TransformerConfig
from onnx_transformer_tpu.ops import layers as L
from onnx_transformer_tpu.quant import w8a8 as W


# ----------------------------------------------------------- primitives

def test_flip_int8_bit_twos_complement():
    q = jnp.asarray([0, 1, -1, 127, -128], jnp.int8)
    got = np.array(B.flip_int8_bit(q, 7))
    # XOR of the sign bit on two's complement
    want = np.array([v ^ 0x80 for v in np.asarray(q).view(np.uint8)], np.uint8).view(np.int8)
    np.testing.assert_array_equal(got, want)


def test_flip_int8_bit_involution():
    q = jnp.asarray(np.random.default_rng(0).integers(-128, 128, 64), jnp.int8)
    for bit in range(8):
        np.testing.assert_array_equal(
            np.array(B.flip_int8_bit(B.flip_int8_bit(q, bit), bit)), np.array(q)
        )


def test_flip_int4_bit_wraparound():
    # inject_utils/layers.py:48-59: flips stay within [-8, 7]
    q = jnp.asarray([-8, -1, 0, 7, 3], jnp.int8)
    for bit in range(4):
        out = np.array(B.flip_int4_bit(q, bit))
        assert out.min() >= -8 and out.max() <= 7
    np.testing.assert_array_equal(np.array(B.flip_int4_bit(jnp.asarray([0], jnp.int8), 3)), [-8])
    np.testing.assert_array_equal(np.array(B.flip_int4_bit(jnp.asarray([-8], jnp.int8), 3)), [0])


def test_flip_float32_bit_matches_struct():
    x = jnp.asarray([1.5, -2.25, 0.0, 3.14159e7], jnp.float32)
    for bit in [0, 10, 23, 30, 31]:
        got = np.array(B.flip_float32_bit(x, bit))
        for i, v in enumerate(np.asarray(x)):
            u = struct.unpack("<I", struct.pack("<f", v))[0] ^ (1 << bit)
            w = struct.unpack("<f", struct.pack("<I", u))[0]
            if np.isnan(w):
                w = 0.0  # NaN clamp, inject_utils/layers.py:28-32
            assert got[i] == np.float32(w), (bit, i)


def test_flip_float32_nan_clamps_to_zero():
    # flipping an exponent bit of inf-adjacent patterns can produce NaN
    x = jnp.asarray([np.float32(np.inf)], jnp.float32)
    out = np.array(B.flip_float32_bit(x, 22))  # inf -> NaN pattern
    assert np.isfinite(out).all()


def test_row_and_col_segment_faults():
    q = jnp.zeros((4, 8), jnp.int8)
    out = np.array(B.flip_row_segment(q, row=1, col_start=2, width=3, bit=0, kind="int8"))
    assert (out[1, 2:5] == 1).all()
    assert out.sum() == 3
    out2 = np.array(B.flip_col_segment(q, col=5, row_start=0, height=2, bit=1, kind="int8"))
    assert (out2[0:2, 5] == 2).all()
    assert out2.sum() == 4


def test_random_value_and_bitflip_change_one_element():
    x = jnp.ones((3, 5), jnp.float32)
    y = np.array(B.set_random_value(x, jax.random.key(1)))
    assert B.count_mismatches(x, y) <= 1
    z = np.array(B.flip_random_output_bit(x, jax.random.key(2), 20))
    assert B.count_mismatches(x, z) == 1


# ------------------------------------------------------------- campaign

@pytest.fixture(scope="module")
def qmodel():
    cfg = TransformerConfig(
        src_vocab_size=37, tgt_vocab_size=31, num_layers=2, d_model=32,
        d_ff=64, num_heads=4, dropout=0.0,
    )
    m = Transformer(cfg)
    params = m.init(jax.random.key(21))
    payloads = W.quantize_model_params(m, params)
    rng = np.random.default_rng(3)
    src = rng.integers(4, 37, (4, 8)).astype(np.int32)
    sm = np.asarray(L.make_src_mask(jnp.asarray(src)))
    return m, params, payloads, src, sm


def test_disabled_fault_equals_clean_decode(qmodel):
    m, params, payloads, src, sm = qmodel
    from onnx_transformer_tpu.serving.decode import greedy_decode

    ids = C.target_ids(m)
    keys = tuple(sorted(payloads))
    ys_g = np.array(
        C.faulty_greedy_decode(m, keys, params, payloads, C._fault_tree(None, ids),
                               10, jnp.asarray(src), jnp.asarray(sm))
    )
    lin = W.make_w8a8_linear_impl(payloads)
    ys_clean = np.array(greedy_decode(m, params, jnp.asarray(src), jnp.asarray(sm), 10, lin=lin))
    np.testing.assert_array_equal(ys_g, ys_clean)


def test_weight_fault_perturbs_activations_and_is_deterministic(qmodel):
    """A sign-bit weight flip must perturb the faulted layer's output tensor
    (decode *tokens* may or may not flip on a random model — that part is
    data-dependent); the same spec must reproduce identically."""
    m, params, payloads, src, sm = qmodel
    ids = {name: i for i, name in enumerate(sorted(payloads))}
    name = "encoder.layers.0.self_attn.linears.0"
    spec = C.FaultSpec(target=name, fault_model="WEIGHT", bit=7, element=5)
    fault_on = C._fault_tree(spec, ids)
    fault_off = C._fault_tree(None, ids)

    def run(fault):
        taps = {}
        lin = C.make_fault_linear_impl(payloads, ids, fault,
                                       fault["enabled"] & fault["is_encoder"])
        m.encode(params, jnp.asarray(src), jnp.asarray(sm), lin=lin, taps=taps)
        return np.array(taps[name + ".out"])

    clean = run(fault_off)
    faulty = run(fault_on)
    assert not np.allclose(clean, faulty)
    faulty2 = run(fault_on)
    np.testing.assert_array_equal(faulty, faulty2)
    # clean path with fault disabled == no-fault impl
    clean2 = run(fault_off)
    np.testing.assert_array_equal(clean, clean2)


def test_decoder_fault_only_at_inject_step(qmodel):
    m, params, payloads, src, sm = qmodel
    ids = C.target_ids(m)
    keys = tuple(sorted(payloads))
    golden = np.array(
        C.faulty_greedy_decode(m, keys, params, payloads, C._fault_tree(None, ids),
                               10, jnp.asarray(src), jnp.asarray(sm))
    )
    # a decoder fault at a step beyond max_len can never fire
    spec = C.FaultSpec(target="decoder.layers.0.self_attn.linears.0",
                       fault_model="WEIGHT16", bit=7, row=0, col=0, inject_step=99)
    faulty = np.array(
        C.faulty_greedy_decode(m, keys, params, payloads, C._fault_tree(spec, ids),
                               10, jnp.asarray(src), jnp.asarray(sm))
    )
    np.testing.assert_array_equal(faulty, golden)


@pytest.mark.slow
def test_campaign_csv_schema(qmodel, tmp_path):
    m, params, payloads, src, sm = qmodel

    class V:
        itos = ["<s>", "</s>", "<blank>", "<unk>"] + [f"t{i}" for i in range(27)]

    refs = [["t1", "t2"], ["t3"], ["t4", "t5"], ["t6"]]
    specs = [
        C.FaultSpec("encoder.layers.0.self_attn.linears.0", "INPUT", bit=7, element=3),
        C.FaultSpec("decoder.layers.1.feed_forward.w_1", "RANDOM", seed=9, inject_step=1),
    ]
    csv_path = str(tmp_path / "results.csv")
    res = C.run_campaign(m, params, payloads, specs, src, sm, refs, V(),
                         max_len=8, csv_path=csv_path)
    assert len(res.rows) == len(specs) * len(refs)
    import csv as csvmod

    with open(csv_path) as f:
        rows = list(csvmod.reader(f))
    assert rows[0] == ["layer", "golden_bleu", "faulty_bleu", "bit", "fault_model"]
    assert len(rows) == 1 + len(specs) * len(refs)
    assert rows[1][0] == "encoder.layers.0.self_attn.linears.0"


def test_attention_matmul_targets_perturb(qmodel):
    """Faults on the attention bmm targets (the reference's First/SecondMatMul
    JSONs) must perturb the right operand/output tensor via the tap seams,
    deterministically, and leave everything clean when disabled."""
    m, params, payloads, src, sm = qmodel
    ids = C.target_ids(m)
    nm = "encoder.layers.0.self_attn"

    def run(fault):
        taps = {}
        act = fault["enabled"] & fault["is_encoder"]
        lin = C.make_fault_linear_impl(payloads, ids, fault, act)
        inj = C.make_fault_inject(m.cfg.num_layers, ids, fault, act)
        m.encode(params, jnp.asarray(src), jnp.asarray(sm),
                 lin=lin, taps=taps, inject=inj)
        return taps

    clean = run(C._fault_tree(None, ids))
    # fault model -> tensor that must change (scores for QK^T faults,
    # context for AV faults)
    cases = [
        (f"{nm}.qk_matmul", "INPUT", f"{nm}.scores"),
        (f"{nm}.qk_matmul", "WEIGHT", f"{nm}.scores"),
        (f"{nm}.qk_matmul", "RANDOM", f"{nm}.probs"),
        # bit 7 of fp32 is a low mantissa bit: visible in scores, absorbed
        # by the x127 prob quantization grid
        (f"{nm}.qk_matmul", "RANDOM_BITFLIP", f"{nm}.scores"),
        (f"{nm}.av_matmul", "INPUT", f"{nm}.context"),
        (f"{nm}.av_matmul", "WEIGHT", f"{nm}.context"),
        (f"{nm}.av_matmul", "RANDOM", f"{nm}.context"),
    ]
    for target, fm, tensor in cases:
        spec = C.FaultSpec(target=target, fault_model=fm, bit=7,
                           element=5, seed=11)
        t1 = run(C._fault_tree(spec, ids))
        assert not np.allclose(np.array(t1[tensor]), np.array(clean[tensor])), (
            target, fm, tensor)
        t2 = run(C._fault_tree(spec, ids))
        np.testing.assert_array_equal(np.array(t1[tensor]), np.array(t2[tensor]))


@pytest.mark.slow
def test_vmapped_batch_matches_serial(qmodel):
    """faulty_greedy_decode_batch (the on-device Pool replacement) must give
    exactly the per-spec serial results."""
    m, params, payloads, src, sm = qmodel
    ids = C.target_ids(m)
    keys = tuple(sorted(payloads))
    specs = [
        C.FaultSpec("encoder.layers.0.self_attn.linears.0", "WEIGHT", bit=7),
        C.FaultSpec("decoder.layers.1.feed_forward.w_1", "INPUT16", bit=6, row=1),
        C.FaultSpec("encoder.layers.1.self_attn.qk_matmul", "RANDOM", seed=5),
        None,  # padding slot (disabled == golden)
    ]
    trees = [C._fault_tree(s, ids) for s in specs]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    batch = np.array(C.faulty_greedy_decode_batch(
        m, keys, params, payloads, stacked, 10, jnp.asarray(src), jnp.asarray(sm)))
    for e, spec in enumerate(specs):
        serial = np.array(C.faulty_greedy_decode(
            m, keys, params, payloads, C._fault_tree(spec, ids), 10,
            jnp.asarray(src), jnp.asarray(sm)))
        np.testing.assert_array_equal(batch[e], serial)


def test_reference_json_mapping():
    """input/*.json descriptors resolve to the right module targets."""
    f = C.reference_matmul_to_target
    assert f("Encoder/FirstMatMul", "MatMul_3") == "encoder.layers.0.self_attn.qk_matmul"
    assert f("Encoder/SecondMatMul", "MatMul_36") == "encoder.layers.4.self_attn.av_matmul"
    assert f("Encoder/FirstFC", "MatMul_30") == "encoder.layers.3.feed_forward.w_1"
    assert f("Encoder/SecondFC", "MatMul_7") == "encoder.layers.0.feed_forward.w_2"
    assert f("Decoder/FirstMatMul", "MatMul_15") == "decoder.layers.0.self_attn.qk_matmul"
    assert f("Decoder/FirstMatMul", "MatMul_19") == "decoder.layers.0.src_attn.qk_matmul"
    assert f("Decoder/SecondMatMul", "MatMul_80") == "decoder.layers.5.src_attn.av_matmul"
    assert f("Decoder/SecondFC", "MatMul_83") == "decoder.layers.5.feed_forward.w_2"


def test_specs_from_reference_jsons_ingest():
    import os
    d = "/root/reference/input/encoder"
    if not os.path.isdir(d):
        pytest.skip("reference input configs not mounted")
    specs = C.specs_from_reference_jsons(d, fault_models=("INPUT", "RANDOM"),
                                         bit_positions=(0, 7))
    assert len(specs) == 24 * 2 * 2  # 24 encoder descriptors x fm x bits
    cfg6 = TransformerConfig(37, 31)
    ids = C.target_ids(Transformer(cfg6))
    for s in specs:
        assert s.target in ids  # every ingested target resolves
        assert s.ref_name.startswith("MatMul_")


@pytest.mark.slow
def test_reference_descriptors_end_to_end(tmp_path):
    """ALL 60 real input/*.json descriptors (24 encoder + 36 decoder,
    /root/reference/input/encoder/matmul_3.json:1-9) through a real
    mini-campaign: every target must resolve into the compiled fault tree
    and produce a result row; the reference-format CSV must be 3-column
    headerless rows diffable against results_fault_injection/results.csv
    (parallelized_inject_onnx_transformer.py:405-406)."""
    import os

    dirs = ["/root/reference/input/encoder", "/root/reference/input/decoder"]
    if not all(os.path.isdir(d) for d in dirs):
        pytest.skip("reference input configs not mounted")
    specs = C.specs_from_reference_jsons(dirs, fault_models=("INPUT",),
                                         bit_positions=(3,), inject_step=1)
    assert len(specs) == 60   # the full descriptor set, one (fm, bit) each

    cfg = TransformerConfig(src_vocab_size=37, tgt_vocab_size=31,
                            num_layers=6, d_model=32, d_ff=64, num_heads=4,
                            dropout=0.0)
    m = Transformer(cfg)
    params = m.init(jax.random.key(7))
    payloads = W.quantize_model_params(m, params)
    ids = C.target_ids(m)
    for s in specs:
        assert s.target in ids, s.target

    rng = np.random.default_rng(11)
    src = rng.integers(4, 37, (2, 8)).astype(np.int32)
    sm = np.asarray(L.make_src_mask(jnp.asarray(src)))

    class V:
        itos = ["<s>", "</s>", "<blank>", "<unk>"] + [f"t{i}" for i in range(27)]

    refs = [["t1", "t2"], ["t3", "t4"]]
    csv_path = str(tmp_path / "ref_results.csv")
    res = C.run_campaign(m, params, payloads, specs, src, sm, refs, V(),
                         max_len=8, csv_path=csv_path, fanout=16,
                         csv_format="reference")
    assert len(res.rows) == 60 * 2   # every descriptor produced rows
    import csv as csvmod

    with open(csv_path) as f:
        rows = list(csvmod.reader(f))
    assert len(rows) == 60 * 2       # headerless
    for row in rows:
        assert len(row) == 3         # node,golden,faulty — the ref schema
        assert row[0].startswith("MatMul_")
        float(row[1]); float(row[2])
