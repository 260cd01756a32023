"""Native C++ data-core tests: build, exact parity with the python path."""

import numpy as np
import pytest

from onnx_transformer_tpu.data import dataset as DS
from onnx_transformer_tpu.data import native as N
from onnx_transformer_tpu.data.vocab import SPECIALS, Vocab

pytestmark = pytest.mark.skipif(not N.available(), reason="g++ unavailable")


def test_native_vocab_lookup_matches_python():
    v = Vocab(SPECIALS + ["hello", "wörld", "a@@"])
    nv = N.NativeVocab(v.itos, v.default_index)
    assert nv.size == len(v)
    for tok in ["hello", "wörld", "a@@", "<s>", "missing-token"]:
        assert nv.lookup(tok) == v[tok]


def test_native_encode_batch_matches_python_collate():
    v = Vocab(SPECIALS + [f"t{i}" for i in range(20)] + ["ü@@", "ß"])
    pairs = [
        ("t1 t2 t3", "t4 t5"),
        ("ü@@ ß t19", "t0"),
        ("unknown tokens here", "t1 " * 30),   # truncation case
        ("", "t2"),                            # empty source
    ]
    py_src, py_tgt = DS.collate(pairs, v, v, max_padding=12)
    nv = N.NativeVocab(v.itos, v.default_index)
    nat_src, nat_tgt = DS.collate(pairs, v, v, max_padding=12, native=(nv, nv))
    np.testing.assert_array_equal(nat_src, py_src)
    np.testing.assert_array_equal(nat_tgt, py_tgt)


def test_native_line_lengths():
    lens = N.line_lengths(["a b c", "", "  x  ", "one two   three four"])
    np.testing.assert_array_equal(lens, [3, 0, 1, 4])


def test_loader_uses_native_and_matches_pure_python():
    v = Vocab(SPECIALS + [f"t{i}" for i in range(10)])
    pairs = [(f"t{i % 9} t{(i + 1) % 9}", f"t{(i + 2) % 9}") for i in range(40)]
    l_native = DS.BucketedLoader(pairs, v, v, batch_size=8, max_padding=10,
                                 seed=3, use_native=True)
    l_python = DS.BucketedLoader(pairs, v, v, batch_size=8, max_padding=10,
                                 seed=3, use_native=False)
    assert l_native._native is not None
    for bn, bp in zip(l_native, l_python):
        np.testing.assert_array_equal(bn.src, bp.src)
        np.testing.assert_array_equal(bn.tgt, bp.tgt)
        np.testing.assert_array_equal(bn.tgt_mask, bp.tgt_mask)
