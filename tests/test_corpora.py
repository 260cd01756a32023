"""WMT14 / Multi30k corpus-loader tests (offline: HF rows injected)."""

import numpy as np
import pytest

from onnx_transformer_tpu.data import corpora as CO
from onnx_transformer_tpu.data.dataset import BucketedLoader
from onnx_transformer_tpu.data.vocab import SPECIALS


def _fake_wmt14_rows(n=40):
    return [{"translation": {"de": f"der satz nummer {i} ist hier",
                             "en": f"the sentence number {i} is here"}}
            for i in range(n)]


def test_load_wmt14_pairs_from_injected_rows():
    pairs = CO.load_wmt14_pairs(dataset=_fake_wmt14_rows(), limit=10)
    assert len(pairs) == 10
    assert pairs[3] == ("der satz nummer 3 ist hier",
                        "the sentence number 3 is here")


def test_extract_pair_key_introspection():
    """Reference behavior (wmt14_train.py:197-205): nested keys are
    introspected, not hard-coded — odd configs still load."""
    row = {"translation": {"cs": "ahoj svete", "en": "hello world"}}
    assert CO._extract_pair(row, "cs", "en") == ("ahoj svete", "hello world")
    # unknown langs fall back to key order
    assert CO._extract_pair(row, "de", "fr") == ("ahoj svete", "hello world")


def test_build_wmt14_vocab_recipe():
    """min_freq=2 + the reference specials (wmt14_train.py:239-253)."""
    pairs = CO.load_wmt14_pairs(dataset=_fake_wmt14_rows(30))
    vs, vt = CO.build_wmt14_vocab(pairs)
    assert vs.itos[:4] == SPECIALS
    assert "satz" in vs.itos and "sentence" in vt.itos
    # singletons (the per-row numbers) are dropped by min_freq=2
    assert "7" not in vs.itos
    assert vs["never-seen-token"] == vs["<unk>"]


def test_wmt14_pairs_ride_the_standard_loader():
    pairs = CO.tokenize_pairs(CO.load_wmt14_pairs(dataset=_fake_wmt14_rows(32)))
    vs, vt = CO.build_wmt14_vocab(pairs)
    loader = BucketedLoader(pairs, vs, vt, batch_size=8, max_padding=16,
                            shuffle=False)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0].src.shape == (8, 16)
    assert (batches[0].src[:, 0] == 0).all()  # BOS


def test_multi30k_file_layout(tmp_path):
    (tmp_path / "train.de").write_text("ein hund läuft\nzwei katzen\n")
    (tmp_path / "train.en").write_text("a dog runs\ntwo cats\n")
    pairs = CO.load_multi30k_pairs(str(tmp_path), "train")
    assert pairs == [("ein hund läuft", "a dog runs"), ("zwei katzen", "two cats")]
    with pytest.raises(FileNotFoundError):
        CO.load_multi30k_pairs(str(tmp_path), "val")


@pytest.mark.slow
def test_real_hf_wmt14_if_cached():
    """Exercise the real datasets.load_dataset path when the HF cache has
    wmt14 (offline pods usually won't)."""
    try:
        pairs = CO.load_wmt14_pairs("validation", limit=4)
    except Exception:
        pytest.skip("HF wmt14 not cached (offline)")
    assert len(pairs) == 4 and all(len(p) == 2 for p in pairs)


def test_iwslt15_tsv_pipeline(tmp_path):
    """preprocess (raw -> TSV, preprocess.py:24-31) + TSV loader with the
    reference's max-len filter (dataloader.py:15-17,30-39)."""
    (tmp_path / "raw.vi").write_text(
        "<url>http://x</url>\nxin chào thế giới\n\ndài " + "a " * 120 + "\n")
    (tmp_path / "raw.en").write_text(
        "<url>http://x</url>\nhello world\n\nlong " + "a " * 120 + "\n")
    out = str(tmp_path / "train.tsv")
    kept = CO.preprocess_iwslt_raw(str(tmp_path / "raw.vi"),
                                   str(tmp_path / "raw.en"), out)
    assert kept == 2  # tag line and empty line dropped
    pairs = CO.load_tsv_pairs(out, max_len=100)
    assert pairs == [("xin chào thế giới", "hello world")]  # long pair filtered
    assert len(CO.load_tsv_pairs(out, max_len=None)) == 2
