"""Token cleaning pipeline and per-section term statistics.

`laundry` reproduces the reference pipeline exactly (reference:
parser/parser.go:177-193): strip non-alphanumerics -> split on whitespace ->
lowercase -> Porter2 stem -> drop stopwords (checked on the *stemmed* form).

`term_stats` reproduces getWordInfo (reference: parser/parser.go:195-207):
per-term frequency and position lists, with meta terms assigned the sentinel
position -100.
"""

from __future__ import annotations

import re
from functools import lru_cache

from ..config import META_POSITION
from .porter2 import stem
from .stopwords import is_stopword

_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")
_TOKEN = re.compile(r"\S+")

# corpora are Zipf-distributed: the same words stem over and over
_stem = lru_cache(maxsize=1 << 17)(stem)


def laundry(text: str) -> list[str]:
    """Clean raw text into a list of stemmed, stopword-filtered tokens."""
    text = _NON_ALNUM.sub(" ", text)
    out: list[str] = []
    for raw in _TOKEN.findall(text):
        cleaned = _stem(raw.lower())
        if not is_stopword(cleaned):
            out.append(cleaned)
    return out


def term_stats(
    words: list[str], meta: list[str] | None = None
) -> tuple[dict[str, int], dict[str, list[float]]]:
    """Frequency and position lists per term.

    Body/title words get their 0-based position; meta words append the
    sentinel META_POSITION and still count toward frequency.
    """
    freq: dict[str, int] = {}
    pos: dict[str, list[float]] = {}
    for p, w in enumerate(words):
        pos.setdefault(w, []).append(float(p))
        freq[w] = freq.get(w, 0) + 1
    for w in meta or ():
        pos.setdefault(w, []).append(META_POSITION)
        freq[w] = freq.get(w, 0) + 1
    return freq, pos
