import numpy as np
import pytest

from grove_tpu.evals.captions import bleu, caption_metrics, cider_d, rouge_l
from grove_tpu.evals.meteor import meteor_sentence, porter_stem
from grove_tpu.evals.iground import (box_average_precision, compute_iou,
                                     find_best_matches, grounding_recall,
                                     mean_iou, token_tf_cosine)
from grove_tpu.evals.pointing import pointing_accuracy
from grove_tpu.evals.vidstg import evaluate_vidstg, np_box_iou


def test_compute_iou_plus_one_convention():
    # identical 10x10 box (0..9 inclusive)
    a = [0, 0, 9, 9]
    assert compute_iou(a, a) == 1.0
    # half overlap with +1 convention
    b = [5, 0, 14, 9]
    iou = compute_iou(a, b)
    assert abs(iou - (50 / 150)) < 1e-9


def test_mean_iou_perfect():
    gts = {"v": [{"bboxes": [[0, 0, 10, 10]], "labels": ["a"]}]}
    preds = {"v": [{"bboxes": [[0, 0, 10, 10]], "labels": ["a"]}]}
    assert mean_iou(preds, gts) == 1.0
    assert mean_iou(preds, gts, mode="video") == 1.0


def test_grounding_recall_matching():
    gts = {"v": [{"bboxes": [[0, 0, 10, 10], [20, 20, 30, 30]],
                  "labels": ["a red cup", "the dog"]}]}
    preds = {"v": [{"bboxes": [[0, 0, 10, 10], [20, 20, 30, 30]],
                    "labels": ["red cup", "a cat"]}]}
    # first matches (IoU 1.0, sim > 0.5); second fails text sim
    r = grounding_recall(preds, gts)
    assert r == 0.5


def test_box_ap_perfect_and_miss():
    gts = {"v": [{"bboxes": [[0, 0, 10, 10]], "labels": ["x"]}]}
    preds = {"v": [{"bboxes": [[0, 0, 10, 10]], "labels": ["x"],
                    "scores": [0.9]}]}
    ap = box_average_precision(preds, gts)
    assert ap["AP50"] > 0.99
    assert ap["AP"] > 0.99
    preds_bad = {"v": [{"bboxes": [[50, 50, 60, 60]], "labels": ["x"],
                        "scores": [0.9]}]}
    ap = box_average_precision(preds_bad, gts)
    assert ap["AP"] == 0.0


def test_bleu_identity():
    gts = {"1": ["a cat sits on the mat"]}
    res = {"1": "a cat sits on the mat"}
    scores = bleu(gts, res)
    for s in scores:
        assert abs(s - 1.0) < 1e-9


def test_bleu_partial():
    gts = {"1": ["the cat is on the mat"]}
    res = {"1": "the cat on the mat"}
    scores = bleu(gts, res)
    assert 0 < scores[3] < 1.0
    assert scores[0] > scores[3]


def test_rouge_l():
    gts = {"1": ["a b c d e"]}
    assert rouge_l(gts, {"1": "a b c d e"}) == 1.0
    partial = rouge_l(gts, {"1": "a c e"})
    assert 0 < partial < 1.0


def test_cider_identity_beats_mismatch():
    gts = {"1": ["a red block moves past the table"],
           "2": ["the green ball bounces"],
           "3": ["someone slices an onion"]}
    res_good = {k: v[0] for k, v in gts.items()}
    res_bad = {k: "completely unrelated words here" for k in gts}
    assert cider_d(gts, res_good) > cider_d(gts, res_bad)


def test_caption_metrics_bundle():
    gts = {"1": ["a cat sits quietly on the mat"]}
    out = caption_metrics(gts, {"1": "a cat sits quietly on the mat"})
    assert out["Bleu_4"] > 0.99
    assert out["METEOR"] > 0.95  # identical hyp: fmean 1, tiny chunk penalty
    assert out["SPICE"] is None  # explicitly unavailable, not faked


def test_porter_stem_canonical_examples():
    # Examples straight from Porter (1980), one per rule family.
    cases = {
        "caresses": "caress", "ponies": "poni", "caress": "caress",
        "cats": "cat",                     # 1a
        "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "sing": "sing", "conflated": "conflat", "sized": "size",
        "hopping": "hop", "falling": "fall", "failing": "fail",  # 1b
        "happy": "happi", "sky": "sky",    # 1c
        "relational": "relat", "conditional": "condit",
        "vietnamization": "vietnam", "operator": "oper",  # 2
        "triplicate": "triplic", "formative": "form",
        "electrical": "electr", "hopefulness": "hope",  # 3 (then 4 on "ic")
        "revival": "reviv", "adjustment": "adjust",
        "adoption": "adopt", "replacement": "replac",     # 4
        "probate": "probat", "rate": "rate", "cease": "ceas",  # 5a
        "controll": "control", "roll": "roll",            # 5b
    }
    for word, want in cases.items():
        assert porter_stem(word) == want, (word, porter_stem(word), want)


def test_meteor_hand_computed():
    # Identical sentences: m=4, P=R=1, fmean=1, chunks=1,
    # penalty = 0.5 * (1/4)^3 = 1/128.
    s = meteor_sentence(["this is a cat"], "this is a cat")
    assert abs(s - (1 - 0.5 / 64)) < 1e-9
    # Full inversion: m=2, fmean=1, chunks=2, penalty=0.5*(2/2)^3=0.5.
    assert abs(meteor_sentence(["a b"], "b a") - 0.5) < 1e-9
    # Stem-stage match: "cats"/"cat" and "running"/"runs" align via stems.
    full = meteor_sentence(["the cat runs"], "the cats running")
    assert full > 0.9
    # No overlap at all.
    assert meteor_sentence(["x y z"], "p q r") == 0.0
    # Recall-weighted mean (alpha=0.9): hyp "a b" vs ref "a b c d":
    # m=2, P=1, R=0.5, fmean = 0.5/(0.9 + 0.1*0.5) = 10/19,
    # chunks=1, penalty = 0.5*(1/2)^3 = 1/16.
    s = meteor_sentence(["a b c d"], "a b")
    assert abs(s - (10 / 19) * (15 / 16)) < 1e-9
    # Multiple references: take the best one.
    assert (meteor_sentence(["a b", "p q"], "a b")
            == meteor_sentence(["a b"], "a b"))


def test_vidstg_viou():
    gt = {"v1": {"frame_ids": [0, 1], "boxes": [[0, 0, 10, 10],
                                                [0, 0, 10, 10]]}}
    pred = {"v1": {"frame_ids": [0, 1],
                   "boxes": [np.array([[0, 0, 10, 10]]),
                             np.array([[0, 0, 5, 10]])],
                   "qtype": "declarative"}}
    out = evaluate_vidstg(pred, gt)
    assert abs(out["declarative_gt_viou"] - 0.75) < 1e-6
    assert out["declarative_gt_viou@0.5"] == 1.0


def test_pointing_accuracy():
    gt = [{"video_id": "v", "segment_idx": 0,
           "segment_bboxes": [(0, 0, 10, 10), (20, 20, 30, 30), None]}]
    preds = {"v_0": {"final_boxes": [np.array([[2, 2, 6, 6]]),
                                     np.array([[0, 0, 5, 5]]), None]}}
    acc, correct, valid = pointing_accuracy(preds, gt)
    assert valid == 2 and correct == 1
    assert abs(acc - 50.0) < 1e-9


def test_meteor_repeated_word_alignment():
    # ref "b a b", hyp "a b": the contiguity-preferring aligner matches
    # hyp "b" to ref index 2 (continuing a@1), giving ONE chunk:
    # m=2, P=1, R=2/3, fmean=(2/3)/(0.9+0.1*2/3)=20/29,
    # penalty=0.5*(1/2)^3=1/16 -> score = (20/29)*(15/16)
    s = meteor_sentence(["b a b"], "a b")
    assert abs(s - (20 / 29) * (15 / 16)) < 1e-9


def test_english_lemma_classes():
    """ANet class matching: CoreNLP-equivalent lemmas on regular
    inflections + common irregulars (evals/lemma.py)."""
    from grove_tpu.evals.lemma import english_lemma as L
    for word, want in [("cups", "cup"), ("babies", "baby"),
                       ("dishes", "dish"), ("knives", "knife"),
                       ("children", "child"), ("people", "person"),
                       ("glasses", "glass"), ("tomatoes", "tomato"),
                       ("slicing", "slice"), ("running", "run"),
                       ("stopped", "stop"), ("scissors", "scissors"),
                       ("bus", "bus"), ("cat", "cat")]:
        assert L(word) == want, (word, L(word), want)
    # wired as the anet default
    from grove_tpu.evals.anet import naive_lemma
    assert naive_lemma("babies") == "baby"


def test_lemma_regular_ve_words_not_mangled():
    """Regression: the blanket -ves -> -f rule corrupted regular -ve
    plurals; only the tabled f/fe irregulars map to -f."""
    from grove_tpu.evals.lemma import english_lemma as L
    assert L("gloves") == "glove"
    assert L("waves") == "wave"
    assert L("moves") == "move"
    assert L("sleeves") == "sleeve"
    assert L("knives") == "knife"    # irregular, from the table
    assert L("leaves") == "leaf"
