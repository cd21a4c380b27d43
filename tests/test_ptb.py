"""Golden pins for the PTB-style caption tokenizer (evals/ptb.py).

Expected token streams follow Stanford PTBTokenizer conventions
(`-preserveLines -lowerCase`, ptb3Escaping) as invoked by pycocoevalcap
before every caption scorer in the reference (`eval_iground.py:461-468`).
"""

import pytest

from grove_tpu.evals.ptb import PUNCTUATIONS, ptb_tokenize, pycoco_tokenize


CASES = [
    # the classic Stanford doc example (lowercased)
    ('"Oh, no," she\'s saying, "our $400 blender can\'t handle '
     'something this hard!"',
     "`` oh , no , '' she 's saying , `` our $ 400 blender ca n't "
     "handle something this hard ! ''"),
    # contraction clitics
    ("They'll save and invest more.",
     "they 'll save and invest more ."),
    ("I'm sure we've seen it; you're right, he'd agree.",
     "i 'm sure we 've seen it ; you 're right , he 'd agree ."),
    # Treebank special forms (Stanford FAQ: cannot/gonna are split)
    ("I cannot believe it's not butter.",
     "i can not believe it 's not butter ."),
    ("We're gonna win, you gotta see it.",
     "we 're gon na win , you got ta see it ."),
    # won't / can't irregular stems
    ("It won't work and it can't fail.",
     "it wo n't work and it ca n't fail ."),
    # brackets, dashes, ellipsis, percent, acronyms, hyphenated words
    ("A state-of-the-art U.S. blender (new) -- 50% off... wow",
     "a state-of-the-art u.s. blender -LRB- new -RRB- -- 50 % off "
     "... wow"),
    # abbreviation periods stay attached; sentence-final period splits
    ("Add salt, pepper, etc. Then stir.",
     "add salt , pepper , etc. then stir ."),
    # digit-internal comma/colon survive; others split
    ("5,000 people arrived at 5:30, then 6 more: done.",
     "5,000 people arrived at 5:30 , then 6 more : done ."),
    # plural possessive
    ("The dogs' toys are the cats' problem.",
     "the dogs ' toys are the cats ' problem ."),
    # decimals keep their point
    ("It weighs 3.5 pounds.", "it weighs 3.5 pounds ."),
    # question/exclamation
    ("Really?! Yes!", "really ? ! yes !"),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_ptb_tokenize_golden(text, expected):
    assert ptb_tokenize(text) == expected.split()


def test_pycoco_removes_reference_punctuation_list():
    # pycocoevalcap strips exactly its PUNCTUATIONS list post-tokenize;
    # clitics like 's / n't and bracket escapes -LSB-/-RSB- (absent from
    # that list) must SURVIVE
    toks = pycoco_tokenize(
        '"Oh, no," she\'s saying, "our $400 blender can\'t handle '
        'something this hard!"')
    assert toks == ("oh no she 's saying our $ 400 blender ca n't "
                    "handle something this hard").split()
    assert not set(toks) & set(PUNCTUATIONS)
    # square brackets: -LSB-/-RSB- are NOT in pycocoevalcap's list
    assert pycoco_tokenize("a [b] c") == ["a", "-LSB-", "b", "-RSB-", "c"]


def test_identity_on_clean_captions():
    # punctuation-free lowercase text (the golden-metric fixtures) is
    # tokenized identically to a whitespace split
    s = "the cat sat on the mat"
    assert ptb_tokenize(s) == s.split()
    assert pycoco_tokenize(s) == s.split()


def test_caption_metrics_ptb_integration():
    # a trailing period / contraction must no longer distort the n-gram
    # stream: hyp differing only in punctuation scores BLEU-1 == 1
    from grove_tpu.evals.captions import caption_metrics

    gts = {"1": ["The person chops the onion."]}
    res = {"1": "the person chops the onion"}
    m = caption_metrics(gts, res)
    # 1.0 up to pycocoevalcap's (correct+1e-15)/(guess+1e-9) smoothing
    assert m["Bleu_1"] == pytest.approx(1.0, abs=1e-8)
    # and with ptb=False the period makes the ref 6 tokens -> BP < 1
    m_raw = caption_metrics(gts, res, ptb=False)
    assert m_raw["Bleu_1"] < 1.0
