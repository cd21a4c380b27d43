import numpy as np
import pytest

from grove_tpu.text import tagging
from grove_tpu.text.constants import (DET_TOKEN, IGNORE_INDEX,
                                      VIDEO_TOKEN_INDEX)
from grove_tpu.text.conversation import build_prompt, answer_separator
from grove_tpu.text.packing import (det_gather_positions,
                                    mask_conversation_targets, pack_text,
                                    splice_video_tokens)
from grove_tpu.text.prompts import (grounding_prompt, tokenize_with_video,
                                    video_instruction)


def test_tag_and_parse_roundtrip():
    cap = "a man slices an onion on a board"
    spans = [(2, 5), (13, 21)]  # "man", "an onion"
    tagged = tagging.tag_caption(cap, spans)
    assert tagged.count(DET_TOKEN) == 2
    assert tagging.extract_phrases(tagged) == ["man", "an onion"]
    assert tagging.strip_tags(tagged) == cap


def test_parse_generation_fields():
    text = ("SYSTEM stuff ASSISTANT: <p> a cat </p> [DET] sits on "
            "<p> the mat </p> [DET].</s>")
    out = tagging.parse_generation(text)
    assert out["phrases"] == ["a cat", "the mat"]
    assert "[DET]" not in out["text"]
    assert "<p>" not in out["text"]
    assert "<p>" in out["text_tagged"]
    assert "[DET]" not in out["text_tagged"]


def test_repair_generation_well_formed_unchanged():
    text = "<p> a cat </p> [DET] sits on <p> the mat </p> [DET]"
    assert tagging.repair_generation(text) == text


def test_repair_generation_orphan_close():
    # split-word phrase: ".. <p> note </p> [DET] book </p> [DET]" — the
    # orphan </p> must gain an opening <p> after the previous [DET]
    text = "holds a <p> note </p> [DET] book </p> [DET] open"
    fixed = tagging.repair_generation(text)
    assert tagging.extract_phrases(fixed) == ["note", "book"]
    assert fixed.count("[DET]") == 2


def test_repair_generation_bare_det():
    # "[DET] [DET]" with no phrase between → placeholder phrase inserted
    text = "the <p> words </p> [DET] [DET] <p> logo </p> [DET] appear"
    fixed = tagging.repair_generation(text)
    assert tagging.extract_phrases(fixed) == ["words", "object", "logo"]
    assert fixed.count("[DET]") == 3


def test_repair_generation_unclosed_open_dropped():
    text = "a <p> person walks"
    fixed = tagging.repair_generation(text)
    assert "<p>" not in fixed
    assert tagging.strip_tags(fixed) == "a person walks"


def test_repair_generation_det_inside_open_phrase():
    # "<p> skate [DET] park" — det fires inside an open phrase: close it
    text = "riding a <p> skate [DET] park"
    fixed = tagging.repair_generation(text)
    assert tagging.extract_phrases(fixed) == ["skate"]
    assert fixed.count("[DET]") == 1


def test_tokenize_with_video_single_sentinel(mock_tokenizer):
    prompt = grounding_prompt()
    ids = tokenize_with_video(prompt, mock_tokenizer)
    assert ids.count(VIDEO_TOKEN_INDEX) == 1
    assert ids[0] == mock_tokenizer.bos_token_id
    # sentinel sits between <vid_start> and <vid_end>
    pos = ids.index(VIDEO_TOKEN_INDEX)
    assert ids[pos - 1] == mock_tokenizer.token_id("<vid_start>")
    assert ids[pos + 1] == mock_tokenizer.token_id("<vid_end>")


def test_target_masking_answer_visible(mock_tokenizer):
    answer = "<p> a cat </p> [DET] sits ."
    conv = build_prompt(video_instruction("describe the video ?"), answer)
    ids = tokenize_with_video(conv, mock_tokenizer)
    target = mask_conversation_targets(ids, conv, mock_tokenizer)
    assert target.shape[0] == len(ids)
    # BOS masked
    assert target[0] == IGNORE_INDEX
    # every token of the answer (incl. [DET] and </s>) is unmasked
    det_id = mock_tokenizer.token_id(DET_TOKEN)
    kept = [t for t in target if t != IGNORE_INDEX]
    assert det_id in kept
    assert mock_tokenizer.eos_token_id in kept
    # instruction words are masked: count of kept tokens is small
    sep = answer_separator()
    n_answer = len(mock_tokenizer(answer + "</s>").input_ids) - 1
    # reference unmasking also exposes the last instruction token ("ASSISTANT:")
    # because of the sentencepiece-space -2 adjustment; allow +/-2 tokens.
    assert abs(len(kept) - n_answer) <= 2


def test_splice_video_tokens():
    ids = [1, 10, 11, VIDEO_TOKEN_INDEX, 12, 13]
    labels = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 12, 13]
    out_ids, out_labels, start = splice_video_tokens(ids, labels, 4,
                                                     video_fill_id=0)
    assert start == 3
    assert out_ids.shape[0] == len(ids) - 1 + 4
    assert (out_ids[3:7] == 0).all()
    assert (out_labels[3:7] == IGNORE_INDEX).all()
    assert out_ids[7] == 12 and out_labels[-1] == 13


def test_det_gather_positions():
    det = 99
    ids = np.array([1, 5, det, 6, 7, det, 8])
    pos, mask = det_gather_positions(ids, det, max_phrases=4)
    assert mask.tolist() == [True, True, False, False]
    # positions are the index BEFORE each det token
    assert pos[:2].tolist() == [1, 4]


def test_pack_text_end_to_end(mock_tokenizer):
    answer = "<p> a cat </p> [DET] sits on <p> the mat </p> [DET] ."
    conv = build_prompt(video_instruction("describe ?"), answer)
    ids = tokenize_with_video(conv, mock_tokenizer)
    num_vid = 8
    packed = pack_text(
        ids, conv, mock_tokenizer, num_video_tokens=num_vid,
        max_spliced_len=96, det_token_id=mock_tokenizer.token_id(DET_TOKEN),
        max_phrases=4, pad_id=mock_tokenizer.pad_token_id)
    assert packed.input_ids.shape == (96,)
    assert packed.phrase_mask.sum() == 2
    assert packed.length == len(ids) - 1 + num_vid
    # det positions: next token is [DET]
    det_id = mock_tokenizer.token_id(DET_TOKEN)
    for p, m in zip(packed.det_positions, packed.phrase_mask):
        if m:
            assert packed.input_ids[p + 1] == det_id
    # attn mask covers exactly the true length
    assert packed.attn_mask.sum() == packed.length
    # video block marked ignore in labels
    vs = int(packed.video_start)
    assert (packed.labels[vs:vs + num_vid] == IGNORE_INDEX).all()
