"""From-spec SentencePiece: proto round-trip, unigram/BPE encode goldens,
byte fallback, and the HF-protocol wrapper with GROVE special tokens.

Expected ids are hand-traced through the published algorithms (Viterbi
lattice scores / merge orders spelled out in comments).
"""

import math

import pytest

from grove_tpu.text.sentencepiece import (BPE, BYTE, CONTROL, NORMAL,
                                          UNIGRAM, UNKNOWN, SentencePieceTokenizer,
                                          SpModel, SpProcessor, parse_model,
                                          serialize_model)

SPECIALS = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL)]
BYTES = [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]


def unigram_model():
    pieces = SPECIALS + BYTES + [
        ("▁", -3.0, NORMAL),
        ("▁the", -1.0, NORMAL),
        ("▁cat", -2.0, NORMAL),
        ("▁sat", -2.5, NORMAL),
        ("▁ca", -3.5, NORMAL),
        ("c", -4.0, NORMAL),
        ("a", -4.5, NORMAL),
        ("t", -5.0, NORMAL),
        ("h", -5.5, NORMAL),
        ("e", -5.75, NORMAL),
        ("s", -6.0, NORMAL),
    ]
    return SpModel(pieces, model_type=UNIGRAM, byte_fallback=True,
                   remove_extra_whitespaces=True)


def pid(m, piece):
    return next(i for i, (p, _, _) in enumerate(m.pieces) if p == piece)


def test_proto_round_trip():
    m = unigram_model()
    m.pad_id = -1
    m.normalizer_name = "identity"
    m2 = parse_model(serialize_model(m))
    assert m2.pieces == m.pieces
    assert (m2.model_type, m2.byte_fallback, m2.add_dummy_prefix,
            m2.remove_extra_whitespaces, m2.escape_whitespaces) == \
           (m.model_type, m.byte_fallback, m.add_dummy_prefix,
            m.remove_extra_whitespaces, m.escape_whitespaces)
    assert (m2.unk_id, m2.bos_id, m2.eos_id, m2.pad_id) == (0, 1, 2, -1)


def test_unigram_viterbi_golden():
    """"the cat sat" -> "▁the ▁cat ▁sat": the word pieces
    (-1 -2 -2.5 = -5.5) dominate any char decomposition (chars alone cost
    -4..-6 each)."""
    m = unigram_model()
    proc = SpProcessor(m)
    ids = proc.encode("the cat sat")
    assert ids == [pid(m, "▁the"), pid(m, "▁cat"),
                   pid(m, "▁sat")]
    assert proc.decode(ids) == "the cat sat"


def test_unigram_prefers_higher_total_score():
    """"cata" -> "▁cat"+"a" (-2 + -4.5 = -6.5) beats
    "▁ca"+"t"+"a" (-3.5-5-4.5 = -13)."""
    m = unigram_model()
    proc = SpProcessor(m)
    assert proc.encode("cata") == [pid(m, "▁cat"), pid(m, "a")]


def test_unigram_byte_fallback():
    """No piece covers a non-ASCII char -> UNK edge -> UTF-8 byte pieces
    (LLaMA byte_fallback). Decode reassembles the character."""
    m = unigram_model()
    proc = SpProcessor(m)
    ids = proc.encode("café")
    # "▁" has no umbrella piece with "caf", so: ▁ca + ... check
    # only the fallback tail: é = 0xC3 0xA9
    assert ids[-2:] == [pid(m, "<0xC3>"), pid(m, "<0xA9>")]
    assert proc.decode(ids) == "café"


def test_unigram_unk_without_byte_fallback():
    m = unigram_model()
    m.byte_fallback = False
    proc = SpProcessor(m)
    ids = proc.encode("é")
    assert ids == [pid(m, "▁"), m.unk_id]


def test_whitespace_normalization():
    m = unigram_model()
    proc = SpProcessor(m)
    # remove_extra_whitespaces collapses runs; dummy prefix always added
    assert proc.encode("  the   cat  ") == proc.encode("the cat")
    assert proc.encode("") == []


def bpe_model():
    pieces = SPECIALS + BYTES + [
        ("▁", -100.0, NORMAL),
        ("a", -101.0, NORMAL),
        ("b", -102.0, NORMAL),
        ("c", -103.0, NORMAL),
        ("bc", -0.5, NORMAL),
        ("ab", -1.0, NORMAL),
        ("abc", -2.0, NORMAL),
        ("▁a", -3.0, NORMAL),
    ]
    return SpModel(pieces, model_type=BPE, byte_fallback=True)


def test_bpe_merge_order_golden():
    """"abc" -> "▁abc": candidates over [▁,a,b,c] are ▁a(-3),
    ab(-1), bc(-0.5); best is bc -> [▁,a,bc]; then abc(-2) beats
    ▁a(-3) -> [▁,abc]; no ▁abc piece -> stop."""
    m = bpe_model()
    proc = SpProcessor(m)
    ids = proc.encode("abc")
    assert ids == [pid(m, "▁"), pid(m, "abc")]
    assert proc.decode(ids) == "abc"


def test_bpe_unmergeable_chars_fall_back():
    m = bpe_model()
    proc = SpProcessor(m)
    ids = proc.encode("az")           # no 'z' piece -> byte fallback
    assert ids == [pid(m, "▁a"), pid(m, "<0x7A>")]
    assert proc.decode(ids) == "az"


def test_hf_wrapper_grove_tokens():
    from grove_tpu.text.constants import GROVE_EXTRA_TOKENS
    from grove_tpu.text.tokenizer import special_token_ids_from

    m = unigram_model()
    tok = SentencePieceTokenizer(m)
    base = len(m.pieces)
    n = tok.add_tokens(list(GROVE_EXTRA_TOKENS), special_tokens=True)
    assert n == len(GROVE_EXTRA_TOKENS)
    # appended in registration order, like HF add_tokens
    assert tok.token_id(GROVE_EXTRA_TOKENS[0]) == base
    assert len(tok) == base + n

    enc = tok("<vid_start>the cat<vid_end>")
    assert enc.input_ids[0] == tok.bos_token_id
    assert enc.input_ids[1] == tok.token_id("<vid_start>")
    assert enc.input_ids[2:4] == [pid(m, "▁the"), pid(m, "▁cat")]
    assert enc.input_ids[4] == tok.token_id("<vid_end>")
    assert tok.decode(enc.input_ids, skip_special_tokens=True) == \
        "<vid_start> the cat <vid_end>"

    ids = special_token_ids_from(tok)
    assert ids.bos == 1 and ids.eos == 2 and ids.pad == tok.unk_token_id
    assert ids.vid_start == tok.token_id("<vid_start>")
    assert ids.det == tok.token_id("[DET]")


def test_wrapper_save_load_round_trip(tmp_path):
    m = unigram_model()
    tok = SentencePieceTokenizer(m)
    tok.add_tokens(["[DET]", "<p>"])
    tok.save_pretrained(str(tmp_path))
    tok2 = SentencePieceTokenizer.from_pretrained(str(tmp_path))
    text = "the cat sat"
    assert tok2(text).input_ids == tok(text).input_ids
    assert tok2.token_id("[DET]") == tok.token_id("[DET]")


def test_load_grove_tokenizer_from_model_file(tmp_path):
    from grove_tpu.text.tokenizer import load_grove_tokenizer

    path = str(tmp_path / "tokenizer.model")
    with open(path, "wb") as f:
        f.write(serialize_model(unigram_model()))
    tok = load_grove_tokenizer(path)
    assert tok.token_id("[DET]") >= 0
    assert tok("the cat").input_ids[1:] == [
        pid(unigram_model(), "▁the"), pid(unigram_model(), "▁cat")]
    # dir containing tokenizer.model (no HF config) also works
    tok2 = load_grove_tokenizer(str(tmp_path))
    assert tok2("the cat").input_ids == tok("the cat").input_ids


def test_unigram_contiguous_unknown_run_merges_to_one_unk():
    """spm merges a contiguous unknown run into a single UNK when byte
    fallback is off (per-char unks would change token counts)."""
    m = unigram_model()
    m.byte_fallback = False
    proc = SpProcessor(m)
    ids = proc.encode("éé")
    assert ids == [pid(m, "▁"), m.unk_id]
    # separated runs stay separate
    ids2 = proc.encode("été")   # t has a piece
    assert ids2 == [pid(m, "▁"), m.unk_id, pid(m, "t"), m.unk_id]
