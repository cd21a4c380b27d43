"""Golden-pinned eval metrics: exact expected values, hand-derived from the
official scorers' algorithms (pycocoevalcap Bleu/Rouge/Cider, pycocotools
COCOeval), asserted to 1e-9.

Every expected value below is computed BY HAND from the published algorithm
(n-gram counts, LCS tables, TF-IDF vectors, P/R curves are spelled out in
comments), not by running our implementation — a silent off-by-convention
bug fails these tests. Known deviations from the official stack are
documented in `grove_tpu/evals/DEVIATIONS.md`.

Fixtures use punctuation-free lowercase sentences so PTBTokenizer (which the
reference applies before scoring) reduces to whitespace split.
"""

import math

import numpy as np

from grove_tpu.evals.captions import bleu, cider_d, rouge_l
from grove_tpu.evals.iground import box_average_precision, coco_iou

TINY, SMALL = 1e-15, 1e-9   # pycocoevalcap bleu_scorer.py smoothing


def test_bleu_corpus_golden():
    """Two-item corpus, multi-ref, with a zero 4-gram order.

    Item A: hyp "the cat sat" (3 tok), refs 6 tok / 3 tok -> closest 3.
      1g: hyp {the,cat,sat}, all in refs -> correct 3 / guess 3
      2g: (the,cat),(cat,sat) both in refs -> 2/2
      3g: (the,cat,sat) in ref1 -> 1/1 ; 4g: 0/0
    Item B: hyp "a dog runs fast" (4 tok), ref "a dog runs very fast" (5).
      1g: 4/4 ; 2g: (a,dog),(dog,runs) hit, (runs,fast) miss -> 2/3
      3g: (a,dog,runs) hit, (dog,runs,fast) miss -> 1/2 ; 4g: 0/1
    Corpus: correct=[7,4,2,0] guess=[7,5,3,1], testlen=7 reflen=8.
    """
    gts = {"A": ["the cat sat on the mat", "a cat sat"],
           "B": ["a dog runs very fast"]}
    res = {"A": "the cat sat", "B": "a dog runs fast"}

    correct, guess = [7, 4, 2, 0], [7, 5, 3, 1]
    prod, expected = 1.0, []
    for k in range(4):
        prod *= (correct[k] + TINY) / (guess[k] + SMALL)
        expected.append(prod ** (1.0 / (k + 1)))
    ratio = (7 + TINY) / (8 + SMALL)
    bp = math.exp(1 - 1 / ratio)                 # testlen < reflen
    expected = [s * bp for s in expected]

    got = bleu(gts, res)
    for g, e in zip(got, expected):
        assert abs(g - e) < 1e-9, (got, expected)


def test_bleu_closest_ref_tie_prefers_shorter():
    """pycocoevalcap's 'closest' eff-ref-len: on a tie the SHORTER ref wins
    (min over (|len diff|, len) tuples). hyp len 3, refs len 2 and 4 both
    at distance 1 -> reflen 2 -> testlen(3) > reflen(2) -> no BP."""
    gts = {"A": ["b c", "a b c d"]}
    res = {"A": "a b c"}
    # 1g: correct 3 (a,b,c all in ref2) / guess 3 -> p1 ~= 1, no BP
    got = bleu(gts, res)
    assert abs(got[0] - (3 + TINY) / (3 + SMALL)) < 1e-12


def test_rouge_l_golden_single_ref():
    """hyp "the cat sat on the mat", ref "the cat lay on the mat":
    LCS = 5 ("the cat on the mat"), P = R = 5/6 -> F = 5/6 exactly
    (beta cancels when P == R)."""
    score = rouge_l({"1": ["the cat lay on the mat"]},
                    {"1": "the cat sat on the mat"})
    assert abs(score - 5 / 6) < 1e-9


def test_rouge_l_golden_separate_prec_rec_maxima():
    """pycocoevalcap Rouge takes max precision and max recall over refs
    SEPARATELY. hyp "a b c"; ref1 "a b c d e f": LCS 3 -> P=1, R=0.5;
    ref2 "a c": LCS 2 -> P=2/3, R=1. prec_max=1 (ref1), rec_max=1 (ref2)
    -> F = 1.0. (The max-per-ref-F convention would give
    2.44*(2/3)/(1+1.44*2/3) = 0.829...; this fixture kills that variant.)
    Second item is an identical pair (F=1) to exercise corpus averaging."""
    gts = {"1": ["a b c d e f", "a c"], "2": ["p q"]}
    res = {"1": "a b c", "2": "p q"}
    assert abs(rouge_l(gts, res) - 1.0) < 1e-9


def test_rouge_l_golden_multi_item_mean():
    """Corpus mean: item1 F=5/6 (above), item2: hyp "x y" ref "x y z w":
    LCS 2 -> P=1, R=0.5, beta=1.2:
    F = (1+1.44)*1*0.5 / (0.5 + 1.44*1) = 1.22/1.94."""
    gts = {"1": ["the cat lay on the mat"], "2": ["x y z w"]}
    res = {"1": "the cat sat on the mat", "2": "x y"}
    expected = (5 / 6 + 1.22 / 1.94) / 2
    assert abs(rouge_l(gts, res) - expected) < 1e-9


def test_cider_d_golden():
    """Two docs, single ref each; hand-computed TF-IDF cosines.

    df: "a" appears in both refs -> idf = log(2) - log(2) = 0;
    every other n-gram appears in one doc -> idf = log(2); n-grams unseen
    in any ref (e.g. hyp's "naps") -> df 0 -> log(max(df,1))=0 -> idf=log2.

    Doc1 hyp == ref "a cat sits": val_n = 1 for n=1..3 ("a" drops out of
    both vectors identically), no 4-grams -> val_4 = 0.
      score_1 = 10 * (1+1+1+0)/4 = 7.5
    Doc2 ref "a dog runs", hyp "a dog naps" (delta = 0):
      n=1: hv = {dog: log2, naps: log2}, rv = {dog: log2, runs: log2}
           dot = (log2)^2 ; norms sqrt(2)*log2 each -> val = 1/2
      n=2: (a,dog) shared, (dog,naps)/(dog,runs) miss -> val = 1/2
      n=3: no shared trigram -> 0 ; n=4: none -> 0
      score_2 = 10 * (0.5+0.5+0+0)/4 = 2.5
    corpus CIDEr-D = (7.5 + 2.5)/2 = 5.0
    """
    gts = {"1": ["a cat sits"], "2": ["a dog runs"]}
    res = {"1": "a cat sits", "2": "a dog naps"}
    assert abs(cider_d(gts, res) - 5.0) < 1e-9


def test_cider_d_count_clipping_golden():
    """CIDEr-D clips hyp counts at ref counts (min(h, r) * r in the dot).

    Docs: ref1 "cat cat", ref2 "dog sits". hyp1 "cat cat cat".
    df(cat)=1 -> idf=log2. n=1 doc1: hv={cat: 3 log2}, rv={cat: 2 log2};
    dot = min(3log2, 2log2)*2log2 = 4(log2)^2 ; norms 3log2 and 2log2
    -> val = 4/(6) = 2/3, delta = 3-2 = 1 -> gauss = exp(-1/72).
    n=2: hyp (cat,cat)x2 idf log2, ref (cat,cat)x1: dot = min(2,1)*1*(log2)^2
    = (log2)^2, norms 2log2 and log2 -> val = 1/2 * exp(-1/72).
    n=3,4: ref has none -> rn=0 -> 0.
    doc1 score = 10*(2/3 + 1/2)*exp(-1/72)/4 = 35/12 * exp(-1/72).
    doc2 identical pair "dog sits": n=1 val 1, n=2 val 1 ((dog,sits) idf
    log2), n=3,4 none -> score = 10*2/4 = 5.
    corpus = (35/12 * exp(-1/72) + 5)/2.
    """
    gts = {"1": ["cat cat"], "2": ["dog sits"]}
    res = {"1": "cat cat cat", "2": "dog sits"}
    expected = (35 / 12 * math.exp(-1 / 72) + 5.0) / 2
    assert abs(cider_d(gts, res) - expected) < 1e-9


def test_coco_iou_no_plus_one():
    # pycocotools semantics: area is (x2-x1)*(y2-y1), no +1
    assert coco_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    # inter 80, areas 80/100 -> union 100 -> exactly 0.8
    assert coco_iou([20, 20, 28, 30], [20, 20, 30, 30]) == 0.8
    assert coco_iou([0, 0, 10, 10], [10, 0, 20, 10]) == 0.0   # touching


def test_box_ap_golden():
    """One frame, 2 GT, 3 dets; COCOeval hand-trace.

    d1 [0,0,10,10] s=.9 -> IoU 1.0 with g1 ; d2 [20,20,28,30] s=.8 ->
    IoU exactly 0.8 with g2 ; d3 far away s=.7.
    Thresholds linspace(.5,.95,10): for the 7 with t <= 0.8:
      ranked records (T,T,F): rec .5,1,1 prec 1,1,2/3 -> all 101 recall
      points have max-prec 1 -> AP_t = 1.
    For t in {.85,.9,.95}: records (T,F,F): rec .5 throughout, prec 1
      at rank1 -> 51 recall points (0..0.5) at prec 1, rest 0
      -> AP_t = 51/101.
    AP = (7*1 + 3*51/101)/10 ; AP50 = AP75 = 1.0.
    """
    gts = {"v": [{"bboxes": [[0, 0, 10, 10], [20, 20, 30, 30]],
                  "labels": ["x", "y"]}]}
    preds = {"v": [{"bboxes": [[0, 0, 10, 10], [20, 20, 28, 30],
                               [50, 50, 60, 60]],
                    "labels": ["x", "y", "z"],
                    "scores": [0.9, 0.8, 0.7]}]}
    out = box_average_precision(preds, gts)
    expected_ap = (7 * 1.0 + 3 * (51 / 101)) / 10
    assert abs(out["AP"] - expected_ap) < 1e-9, out
    assert abs(out["AP50"] - 1.0) < 1e-9
    assert abs(out["AP75"] - 1.0) < 1e-9


def test_box_ap_golden_false_positive_ordering():
    """High-scoring FP ahead of a TP: 1 GT, d1 FP s=.9, d2 TP s=.8.
    records (F,T): rec 0,1 prec 0,0.5 -> every recall point r:
    max prec over rec>=r = 0.5 -> AP_t = 0.5 for all t (TP IoU = 1.0).
    AP = AP50 = AP75 = 0.5."""
    gts = {"v": [{"bboxes": [[0, 0, 10, 10]], "labels": ["x"]}]}
    preds = {"v": [{"bboxes": [[40, 40, 50, 50], [0, 0, 10, 10]],
                    "labels": ["x", "x"], "scores": [0.9, 0.8]}]}
    out = box_average_precision(preds, gts)
    for k in ("AP", "AP50", "AP75"):
        assert abs(out[k] - 0.5) < 1e-9, out
