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
from collections import OrderedDict
from threading import Lock

from ..store.tables import Database
from ..text.htmlparse import extract_summary_text

_NON_ALNUM_RUN = re.compile(r"[^a-zA-Z0-9]+")


def _clean(w: str) -> str:
    return _NON_ALNUM_RUN.sub("", w).lower()


# doc text + cleaned tokens are query-independent; the lxml re-parse is the
# expensive part of every summary (the reference re-parses per result,
# get_metadata.go:85-115). LRU keyed by doc hash, invalidated by content
# hash so a re-crawled doc re-extracts.
_TEXT_CACHE: OrderedDict[str, tuple[int, list[str], list[str]]] = OrderedDict()
_TEXT_CACHE_CAP = 20_000
_TEXT_LOCK = Lock()


def _doc_words(db: Database, doc_hash: str) -> tuple[list[str], list[str]] | None:
    raw = db.cached_doc(doc_hash)
    if raw is None:
        return None
    key = hash(raw)
    with _TEXT_LOCK:
        hit = _TEXT_CACHE.get(doc_hash)
        if hit is not None and hit[0] == key:
            _TEXT_CACHE.move_to_end(doc_hash)
            return hit[1], hit[2]
    words = extract_summary_text(raw)
    cleaned = [_clean(w) for w in words]
    with _TEXT_LOCK:
        _TEXT_CACHE[doc_hash] = (key, words, cleaned)
        _TEXT_CACHE.move_to_end(doc_hash)
        while len(_TEXT_CACHE) > _TEXT_CACHE_CAP:
            _TEXT_CACHE.popitem(last=False)
    return words, cleaned


def get_summary(db: Database, doc_hash: str, query: str, phrases: list[str]) -> str:
    got = _doc_words(db, doc_hash)
    if got is None:
        return ""
    words, words_cleaned = got

    query_tokens = query.lower().replace('"', "").split()
    query_cleaned = [_clean(t) for t in query_tokens]
    phrase_cleaned = [[_clean(t) for t in ph.split()] for ph in phrases]

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
