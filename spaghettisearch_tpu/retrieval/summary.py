"""Dynamic document summaries from the raw-HTML cache.

Reproduces the reference's summary logic (reference:
retrieval/get_metadata.go:79-209): re-extract visible text (pruning
a/nav/title/script/style/noscript/iframe subtrees), find the first word
matching any phrase (consecutively) or any query keyword, and emit a
~20-word window with ellipses; otherwise fall back to the middle 21 words.

Serving-path speed: the reference re-parses the cached HTML and scans every
word per result per query (get_metadata.go:85-191). Here the per-doc text is
parsed once (LRU) together with a first-occurrence index and per-word
position lists, so a keyword match is O(query terms) dict lookups and a
phrase match only probes the first phrase word's occurrences — the linear
scan exists only as the test oracle (tests/test_summary_fast.py).
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


# doc text + cleaned tokens + match indexes are query-independent; the lxml
# re-parse is the expensive part of every summary. LRU keyed by doc hash,
# invalidated by content hash so a re-crawled doc re-extracts.
_TEXT_CACHE: OrderedDict[str, tuple] = OrderedDict()
_TEXT_CACHE_CAP = 20_000
_TEXT_LOCK = Lock()


def _doc_index(db: Database, doc_hash: str):
    """-> (words, cleaned, first_pos {cleaned word -> first index},
    positions {cleaned word -> [indexes]}) or None when neither the indexed
    summary text nor the raw HTML is available.

    Fast path: the indexer persists the summary-visible words (doc_summary
    table) so serving only splits a string; stores predating that table fall
    back to re-parsing the HTML cache like the reference does."""
    words: list[str] | None = None
    text = db.doc_summary.get(doc_hash)
    if text is not None:
        key = hash(text)
        with _TEXT_LOCK:
            hit = _TEXT_CACHE.get(doc_hash)
            if hit is not None and hit[0] == key:
                _TEXT_CACHE.move_to_end(doc_hash)
                return hit[1:]
        words = text.split()
    else:
        raw = db.cached_doc(doc_hash)
        if raw is None:
            return None
        key = hash(raw)
        with _TEXT_LOCK:
            hit = _TEXT_CACHE.get(doc_hash)
            if hit is not None and hit[0] == key:
                _TEXT_CACHE.move_to_end(doc_hash)
                return hit[1:]
        words = extract_summary_text(raw)
    cleaned = [_clean(w) for w in words]
    first_pos: dict[str, int] = {}
    positions: dict[str, list[int]] = {}
    for i, wc in enumerate(cleaned):
        if wc not in first_pos:
            first_pos[wc] = i
            positions[wc] = [i]
        else:
            positions[wc].append(i)
    entry = (key, words, cleaned, first_pos, positions)
    with _TEXT_LOCK:
        _TEXT_CACHE[doc_hash] = entry
        _TEXT_CACHE.move_to_end(doc_hash)
        while len(_TEXT_CACHE) > _TEXT_CACHE_CAP:
            _TEXT_CACHE.popitem(last=False)
    return entry[1:]


def _first_match(
    cleaned: list[str],
    first_pos: dict[str, int],
    positions: dict[str, list[int]],
    query_cleaned: list[str],
    phrase_cleaned: list[list[str]],
) -> int:
    """Index of the first word where any phrase matches consecutively or any
    keyword matches — identical to the reference's forward scan
    (get_metadata.go:131-155), without visiting every word."""
    n = len(cleaned)
    best = n  # sentinel: no match
    for t in query_cleaned:
        i = first_pos.get(t, n)
        if i < best:
            best = i
    for ph in phrase_cleaned:
        if not ph:
            continue
        for i in positions.get(ph[0], ()):
            if i >= best:
                break  # a keyword/earlier phrase already matched sooner
            if all(
                i + k < n and cleaned[i + k] == pw for k, pw in enumerate(ph)
            ):
                best = i
                break
    return best if best < n else -1


def get_summary(db: Database, doc_hash: str, query: str, phrases: list[str]) -> str:
    got = _doc_index(db, doc_hash)
    if got is None:
        return ""
    words, cleaned, first_pos, positions = got

    query_tokens = query.lower().replace('"', "").split()
    query_cleaned = [_clean(t) for t in query_tokens]
    phrase_cleaned = [[_clean(t) for t in ph.split()] for ph in phrases]

    match_at = _first_match(cleaned, first_pos, positions, query_cleaned, phrase_cleaned)

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
