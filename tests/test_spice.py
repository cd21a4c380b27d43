"""SPICE_rule: rule-based scene-graph tuple-F1 (evals/spice.py).

Golden values are hand-derived from the documented parser rules —
every tuple set below was traced by hand, so a parser-convention change
that moves any tuple fails loudly here.
"""

from grove_tpu.evals.spice import pos_tags, scene_graph, spice_rule


def test_scene_graph_tuples():
    obj, attr, rel = scene_graph(
        "a young man is cutting a red tomato on a wooden board")
    assert obj == {("man",), ("tomato",), ("board",)}
    assert attr == {("man", "young"), ("tomato", "red"),
                    ("board", "wooden")}
    assert rel == {("man", "cut", "tomato"), ("tomato", "on", "board")}


def test_scene_graph_participial_modifier():
    """'cutting board' with a determiner parses as attribute (cut, board),
    mirroring CoreNLP's amod edge for participial modifiers."""
    obj, attr, rel = scene_graph(
        "an old man cuts a tomato on a cutting board")
    assert obj == {("man",), ("tomato",), ("board",)}
    assert attr == {("man", "old"), ("board", "cut")}
    assert rel == {("man", "cut", "tomato"), ("tomato", "on", "board")}


def test_spice_rule_hand_computed_f1():
    """cand: 8 tuples, ref: 7 tuples, 5 shared (3 objects + 2 relations)
    -> P=5/8, R=5/7, F1 = 2/3 exactly."""
    gts = {"v": ["an old man cuts a tomato on a cutting board"]}
    res = {"v": "a young man is cutting a red tomato on a wooden board"}
    got = spice_rule(gts, res)
    assert abs(got - 2.0 / 3.0) < 1e-12, got


def test_spice_rule_perfect_and_miss():
    gts = {"a": ["a dog runs in the park"], "b": ["a red car"]}
    assert spice_rule(gts, {"a": "a dog runs in the park",
                            "b": "a red car"}) == 1.0
    assert spice_rule({"a": ["a dog runs in the park"]},
                      {"a": "purple elephants fly"}) == 0.0


def test_spice_rule_multi_ref_union():
    """Reference tuples union across refs: a candidate matching tuples
    split over two refs gets full precision."""
    gts = {"v": ["a man holds a knife", "the man wears a hat"]}
    res = {"v": "a man holds a knife and wears a hat"}
    # cand: objects man/knife/hat, relations (man,hold,knife) —
    # CONJ 'and' blocks (knife, wear, hat), which is the correct parse
    got = spice_rule(gts, res)
    # cand tuples: (man),(knife),(hat),(man,hold,knife) = 4, all in ref
    # union; ref union: man,knife,hat,(man,hold,knife),(man,wear,hat) = 5
    p, r = 4 / 4, 4 / 5
    want = 2 * p * r / (p + r)
    assert abs(got - want) < 1e-12, got


def test_pos_tags_basics():
    toks = "the man quickly slices an onion".split()
    assert pos_tags(toks) == ["DET", "NOUN", "ADV", "VERB", "DET", "NOUN"]


def test_caption_metrics_exposes_spice_rule():
    from grove_tpu.evals.captions import caption_metrics
    gts = {"v": ["a man cuts a tomato"]}
    res = {"v": "a man cuts a tomato"}
    m = caption_metrics(gts, res)
    assert m["SPICE"] is None                 # jar metric: never faked
    assert m["SPICE_rule"] == 1.0
    assert "rule-based" in m["SPICE_variant"]
