"""Data pipeline tests: vocab artifact parity, collation, bucketing, masks."""

import numpy as np
import pytest

from onnx_transformer_tpu.data import dataset as DS
from onnx_transformer_tpu.data import vocab as V


def test_iwslt14_vocab_artifact_sizes():
    vs, vt = V.load_iwslt14_vocab()
    # reference error.log:3-5 — src 5337 / tgt 4444
    assert len(vs) == 5337
    assert len(vt) == 4444
    for vv in (vs, vt):
        assert vv.itos[:4] == ["<s>", "</s>", "<blank>", "<unk>"]
        assert vv["definitely-not-a-token-xyz"] == V.UNK_ID


def test_build_vocab_order():
    streams = [["b", "a", "b", "c"], ["b", "a"]]
    v = V.build_vocab(iter(streams), min_freq=2)
    assert v.itos[:4] == V.SPECIALS
    assert v.itos[4:] == ["b", "a"]  # c has freq 1 < 2


def test_encode_sentence_pads_and_wraps():
    v = V.Vocab(V.SPECIALS + ["hello", "world"])
    enc = DS.encode_sentence("hello world", v, 8)
    assert enc.tolist() == [0, 4, 5, 1, 2, 2, 2, 2]


def test_encode_sentence_truncates_keeping_eos():
    v = V.Vocab(V.SPECIALS + ["a"])
    enc = DS.encode_sentence("a a a a a a a a a", v, 5)
    assert enc.tolist() == [0, 4, 4, 4, 1]


def test_collate_and_masks():
    v = V.Vocab(V.SPECIALS + ["x", "y"])
    src, tgt = DS.collate([("x y", "y"), ("x", "x y")], v, v, max_padding=6)
    assert src.shape == tgt.shape == (2, 6)
    b = DS.Batch.make(src, tgt)
    assert b.src_mask.shape == (2, 1, 6)
    assert b.tgt_in.shape == (2, 5)
    assert b.tgt_y.shape == (2, 5)
    assert b.tgt_mask.shape == (2, 5, 5)
    # shifted: tgt_y[i, j] == tgt[i, j+1]
    np.testing.assert_array_equal(b.tgt_y, tgt[:, 1:])
    # causal structure
    assert not b.tgt_mask[0, 0, 1]
    assert b.ntokens == int((tgt[:, 1:] != V.PAD_ID).sum())


def test_bucketed_loader_static_shapes():
    v = V.Vocab(V.SPECIALS + ["a", "b"])
    pairs = [("a " * (i % 7 + 1), "b " * (i % 5 + 1)) for i in range(64)]
    loader = DS.BucketedLoader(pairs, v, v, batch_size=8, max_padding=16, seed=1)
    batches = list(loader)
    assert len(batches) == 8
    for b in batches:
        assert b.src.shape == (8, 16)
    # epoch reshuffling changes order
    loader.set_epoch(1)
    b2 = list(loader)
    assert any(
        not np.array_equal(x.src, y.src) for x, y in zip(batches, b2)
    )


def test_token_budget_bucketing():
    """Token-count batching (reference batch_size_fn, train.py:48-58) in
    shape-static form: every batch shape is (bucket_bsz, bucket_len) from a
    fixed bucket set, and padded token count stays within the budget."""
    v = V.Vocab(V.SPECIALS + ["a", "b"])
    pairs = [("a " * (i % 14 + 1), "b " * (i % 9 + 1)) for i in range(256)]
    budget = 256
    loader = DS.BucketedLoader(
        pairs, v, v, max_padding=16, seed=1, token_budget=budget,
        length_buckets=(8, 12, 16), drop_last=False)
    batches = list(loader)
    seen_shapes = set()
    total = 0
    for b in batches:
        bsz, l = b.src.shape
        assert l in (8, 12, 16)
        expect_bsz = loader._bucket_bsz(l)
        assert bsz <= expect_bsz
        assert expect_bsz * l <= budget + 8 * l  # rounding slack
        seen_shapes.add((bsz, l))
        total += bsz
    assert total == len(pairs)  # drop_last=False consumes everything
    assert len(seen_shapes) >= 2  # short and long sentences batched apart
    # full-size batches dominate (static compile shapes)
    full = sum(1 for b in batches
               if b.src.shape[0] == loader._bucket_bsz(b.src.shape[1]))
    assert full >= len(batches) - len(loader.length_buckets)


def test_loader_sharding_partitions():
    v = V.Vocab(V.SPECIALS + ["a"])
    pairs = [(f"a", f"a") for _ in range(32)]
    l0 = DS.BucketedLoader(pairs, v, v, batch_size=4, shuffle=False, num_shards=2, shard_index=0)
    l1 = DS.BucketedLoader(pairs, v, v, batch_size=4, shuffle=False, num_shards=2, shard_index=1)
    assert len(l0) == len(l1) == 4


def test_unbpe():
    assert DS.unbpe(["wir@@", "klich", "gut"]) == "wir@@ klich gut".replace("@@ ", "")
    assert DS.unbpe(["sta@@", "un@@", "en"]) == "staunen"


def test_real_data_loads_if_present():
    import os

    data_dir = "/root/reference/data"
    if not os.path.exists(os.path.join(data_dir, "valid.de.bpe")):
        pytest.skip("reference data not mounted")
    pairs = DS.load_split(data_dir, "valid")
    assert len(pairs) == 6969
    test_pairs = DS.load_split(data_dir, "test")
    assert len(test_pairs) == 6750
    vs, vt = V.load_iwslt14_vocab()
    src, tgt = DS.collate(pairs[:4], vs, vt, 72)
    assert src.shape == (4, 72)
    assert (src[:, 0] == V.BOS_ID).all()


def test_token_budget_sharded_lockstep():
    """Token-budget bucketing with num_shards>1 must give every shard the
    SAME number of steps with the SAME bucket shape at each step (lockstep
    multi-host DP: per-bucket compiled shapes may not diverge across hosts),
    and no example may appear on two shards."""
    v = V.Vocab(V.SPECIALS + ["b"] + [f"w{i}" for i in range(512)])
    pairs = [(f"w{i} " * (i % 14 + 1), "b " * (i % 9 + 1)) for i in range(512)]
    loaders = [
        DS.BucketedLoader(
            pairs, v, v, max_padding=16, seed=3, token_budget=128,
            length_buckets=(8, 12, 16), num_shards=2, shard_index=s)
        for s in range(2)
    ]
    b0 = list(loaders[0])
    b1 = list(loaders[1])
    assert len(b0) == len(b1) > 0
    assert len(b0) == len(loaders[0])  # __len__ exact in the sharded mode
    for x, y in zip(b0, b1):
        assert x.src.shape == y.src.shape  # identical compile shape per step
        assert not np.array_equal(x.src, y.src)  # but disjoint data
