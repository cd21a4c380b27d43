"""Grounded-caption tagging: build and parse `<p> phrase </p> [DET]` markup.

The GROVE output protocol wraps each grounded noun phrase in <p>…</p>
followed by a [DET] token. Builders mirror the dataset side
(`dataset/video_grounding_datasets/HowTo100M.py:180-199`), parsers mirror the
inference side (`infer_iground.py:202-240`).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

from .constants import BOP_TOKEN, DET_TOKEN, EOP_TOKEN

_PHRASE_RE = re.compile(r"<p>(.*?)<\/p>")
_ANY_TAG_RE = re.compile(r"<.*?>")


def tag_caption(caption: str, spans: Sequence[Tuple[int, int]]) -> str:
    """Wrap each (start, end) character span of `caption` in tags + [DET].

    Spans must be non-overlapping; they are processed right-to-left so the
    earlier offsets stay valid.
    """
    out = caption
    for start, end in sorted(spans, key=lambda s: -s[0]):
        out = (out[:start] + f"{BOP_TOKEN} {out[start:end]} {EOP_TOKEN} "
               + DET_TOKEN + out[end:])
    return out


def extract_phrases(text: str) -> List[str]:
    """All `<p>…</p>` phrase strings, stripped (`infer_iground.py:208-210`)."""
    return [p.strip() for p in _PHRASE_RE.findall(text)]


def strip_tags(text: str) -> str:
    """Caption with all tags and [DET] removed, whitespace normalized.

    Follows `infer_iground.py:206,221-227`: remove `<...>` tags, drop [DET],
    collapse whitespace, strip quotes.
    """
    cleaned = _ANY_TAG_RE.sub("", text)
    cleaned = cleaned.replace(DET_TOKEN, "")
    cleaned = " ".join(cleaned.split()).strip("'").strip()
    return cleaned


def strip_det_only(text: str) -> str:
    """Caption keeping <p>…</p> tags but removing [DET] tokens.

    Follows `infer_iground.py:229-232` (`pred_text_tagged`).
    """
    cleaned = text.replace(DET_TOKEN, "")
    return " ".join(cleaned.split()).strip("'").strip()


def parse_generation(text_output: str) -> dict:
    """Post-process a raw decoded generation into the public output fields.

    Returns {"text", "text_tagged", "phrases"} exactly as the reference
    inference drivers compute them (`infer_iground.py:202-232`).
    """
    text_output = text_output.replace("\n", "").replace("  ", " ")
    text_output = text_output.split("ASSISTANT: ")[-1]
    return {
        "text": strip_tags(text_output),
        "text_tagged": strip_det_only(text_output),
        "phrases": extract_phrases(text_output),
    }
