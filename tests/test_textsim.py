"""Text-similarity backends + grounding-recall sensitivity across them.

The reference gates recall matches on BERT cosine >= 0.5
(`eval_iground.py:70-98`); these tests document how the asset-free
backends behave relative to that gate and to each other.
"""

import numpy as np
import pytest

from grove_tpu.evals.iground import grounding_recall, token_tf_cosine
from grove_tpu.evals.textsim import (CharNgramEmbedder, char_ngram_cosine,
                                     embedding_cosine, resolve_backend)


def test_char_ngram_basic_properties():
    assert abs(char_ngram_cosine("a red cup", "a red cup") - 1.0) < 1e-9
    assert char_ngram_cosine("", "a red cup") == 0.0
    # symmetric
    a, b = "running dog", "dogs run"
    assert abs(char_ngram_cosine(a, b) - char_ngram_cosine(b, a)) < 1e-12


def test_char_ngram_morphology_vs_tf():
    """Morphological variants: TF cosine is 0 (no shared word), char-ngram
    is above the reference's 0.5 gate (shared stems dominate)."""
    a, b = "running dog", "dogs run"
    assert token_tf_cosine(a, b) == 0.0
    assert char_ngram_cosine(a, b) > 0.5
    # unrelated text stays below the gate
    assert char_ngram_cosine("a red cup", "the yellow banana") < 0.5


def test_recall_sensitivity_across_backends():
    """Same predictions, different similarity backend -> different recall.
    GT label 'the running dog' vs predicted 'dogs run': box IoU is 1.0, so
    the text gate alone decides the match."""
    gts = {"v": [{"bboxes": [[0, 0, 10, 10]], "labels": ["running dog"]}]}
    preds = {"v": [{"bboxes": [[0, 0, 10, 10]], "labels": ["dogs run"]}]}
    r_tf = grounding_recall(preds, gts, text_sim=token_tf_cosine)
    r_cn = grounding_recall(preds, gts, text_sim=char_ngram_cosine)
    assert r_tf == 0.0
    assert r_cn == 1.0


def test_embedding_backend_npz(tmp_path):
    """Word-vector table: 'dog' and 'puppy' given nearby vectors -> synonym
    pair clears the gate (what char-ngram cannot do)."""
    path = str(tmp_path / "emb.npz")
    np.savez(path,
             dog=np.array([1.0, 0.1, 0.0]),
             puppy=np.array([0.9, 0.2, 0.1]),
             car=np.array([0.0, 0.0, 1.0]))
    sim = embedding_cosine(path)
    assert sim("dog", "puppy") > 0.9
    assert sim("dog", "car") < 0.2
    assert char_ngram_cosine("dog", "puppy") < 0.5
    # OOV-everything falls back to char-ngram (not a hard zero)
    assert sim("running dog", "dogs run") > 0.5


def test_resolve_backend():
    assert resolve_backend("tf") is token_tf_cosine
    assert resolve_backend("char_ngram") is char_ngram_cosine
    with pytest.raises(ValueError):
        resolve_backend("bert")


def test_embedder_cache_bounded():
    emb = CharNgramEmbedder(dim=256)
    for i in range(100):
        emb(f"word{i}", "anchor")
    assert len(emb._word_cache) <= 65536
