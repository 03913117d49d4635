"""Dynamic document summaries from the raw-HTML cache.

Reproduces the reference's summary logic (reference:
retrieval/get_metadata.go:79-209): re-extract visible text (pruning
a/nav/title/script/style/noscript/iframe subtrees), find the first word
matching any phrase (consecutively) or any query keyword, and emit a
~20-word window with ellipses; otherwise fall back to the middle 21 words.
"""

from __future__ import annotations

import math
import re

from ..store.tables import Database
from ..text.htmlparse import extract_summary_text

_NON_ALNUM_RUN = re.compile(r"[^a-zA-Z0-9]+")


def _clean(w: str) -> str:
    return _NON_ALNUM_RUN.sub("", w).lower()


def get_summary(db: Database, doc_hash: str, query: str, phrases: list[str]) -> str:
    raw = db.cached_doc(doc_hash)
    if raw is None:
        return ""
    words = extract_summary_text(raw)

    query_tokens = query.lower().replace('"', "").split()
    query_cleaned = [_clean(t) for t in query_tokens]
    phrase_cleaned = [[_clean(t) for t in ph.split()] for ph in phrases]
    words_cleaned = [_clean(w) for w in words]

    match_at = -1
    for i, wc in enumerate(words_cleaned):
        is_match = False
        for ph in phrase_cleaned:
            if ph and all(
                i + k < len(words_cleaned) and words_cleaned[i + k] == pw
                for k, pw in enumerate(ph)
            ):
                is_match = True
                break
        if not is_match and wc in query_cleaned:
            is_match = True
        if is_match:
            match_at = i
            break

    if match_at >= 0:
        i = match_at
        if i - 10 < 0:
            diff = 20 - i
            out = words[:i]
        else:
            diff = 0
            out = ["..."] + words[i - 10 : i]
        span = 10 if diff == 0 else diff
        if i + span <= len(words):
            out += words[i : i + span] + ["..."]
        else:
            out += words[i:]
        return " ".join(out)

    # static fallback: middle window
    if len(words) > 21:
        i = math.ceil(len(words) / 2.0)
        return " ".join(["..."] + words[i - 10 : i + 11] + ["..."])
    return " ".join(words + ["..."])
