"""BLEU tests: hand-computed values + nltk cross-check when available."""

import math

import pytest

from onnx_transformer_tpu.evaluation.bleu import (
    brevity_penalty,
    closest_ref_length,
    corpus_bleu,
    modified_precision,
    sentence_bleu,
)


def test_perfect_match():
    hyp = "the cat sat on the mat".split()
    assert sentence_bleu([hyp], hyp) == pytest.approx(1.0)


def test_modified_precision_clipping():
    # classic clipping example: hyp all "the", ref has 2 "the"
    hyp = ["the"] * 7
    ref = "the cat is on the mat".split()
    p1 = modified_precision([ref], hyp, 1)
    assert p1.numerator == 2 and p1.denominator == 7


def test_brevity_penalty():
    assert brevity_penalty(10, 12) == 1.0
    assert brevity_penalty(12, 10) == pytest.approx(math.exp(1 - 1.2))
    assert brevity_penalty(5, 0) == 0.0


def test_closest_ref_length_tie_prefers_shorter():
    refs = [["a"] * 8, ["a"] * 12]
    assert closest_ref_length(refs, 10) == 8


def test_zero_overlap_is_zero():
    assert sentence_bleu([["a", "b"]], ["c", "d"]) == 0.0


def test_method1_smoothing_known_value():
    hyp = "the the cat".split()
    ref = "the cat".split()
    # p1 = 3/3? no: counts the:2 (clip 1), cat:1 -> 2/3 ; p2: "the the","the cat" -> 1/2
    # p3, p4: hyp too short -> 0/1 -> eps
    p1, p2 = 2 / 3, 1 / 2
    eps = 0.1
    s = 0.25 * (math.log(p1) + math.log(p2) + math.log(eps / 1) + math.log(eps / 1))
    bp = 1.0  # hyp_len 3 > ref_len 2
    want = bp * math.exp(s)
    got = sentence_bleu([ref], hyp, smoothing="method1")
    assert got == pytest.approx(want, rel=1e-9)


def test_corpus_bleu_aggregates_not_averages():
    refs = [[["a", "b", "c", "d"]], [["e", "f", "g", "h"]]]
    hyps = [["a", "b", "c", "d"], ["e", "f", "x", "y"]]
    c = corpus_bleu(refs, hyps)
    s = (sentence_bleu(refs[0], hyps[0]) + sentence_bleu(refs[1], hyps[1])) / 2
    assert c != pytest.approx(s)


def test_against_nltk_if_available():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import SmoothingFunction
    from nltk.translate.bleu_score import corpus_bleu as nltk_corpus
    from nltk.translate.bleu_score import sentence_bleu as nltk_sentence

    cases = [
        ([["the cat sat on the mat".split()]], ["the cat sat on a mat".split()]),
        ([["a b c d e f g".split()]], ["a b c x e f y".split()]),
        ([["it is a small test".split()]], ["it is test".split()]),
    ]
    sf = SmoothingFunction()
    for refs, hyps in cases:
        assert corpus_bleu(refs, hyps) == pytest.approx(
            nltk_corpus(refs, hyps), rel=1e-9
        )
        assert sentence_bleu(refs[0], hyps[0], smoothing="method1") == pytest.approx(
            nltk_sentence(refs[0], hyps[0], smoothing_function=sf.method1), rel=1e-9
        )
        assert sentence_bleu(refs[0], hyps[0], smoothing="method4") == pytest.approx(
            nltk_sentence(refs[0], hyps[0], smoothing_function=sf.method4), rel=1e-9
        )
