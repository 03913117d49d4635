"""The indexed summary matcher must be scan-for-scan identical to the
reference's linear forward scan (retrieval/get_metadata.go:131-155), which is
reimplemented here as the oracle."""

import math
import random

from spaghettisearch_tpu.retrieval.summary import _clean, get_summary
from spaghettisearch_tpu.store.tables import Database


def _reference_summary(words: list[str], query: str, phrases: list[str]) -> str:
    """The round-1 linear-scan implementation (== reference semantics)."""
    words_cleaned = [_clean(w) for w in words]
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
    if len(words) > 21:
        i = math.ceil(len(words) / 2.0)
        return " ".join(["..."] + words[i - 10 : i + 11] + ["..."])
    return " ".join(words + ["..."])


def test_indexed_summary_equals_linear_scan():
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)] + ["Mixed-Case!", "punct,", "42", "-"]
    db = Database(None)
    for trial in range(300):
        n = rng.randint(0, 60)
        words = [rng.choice(vocab) for _ in range(n)]
        html = (
            "<html><head><title>t</title></head><body><p>"
            + " ".join(words)
            + "</p></body></html>"
        ).encode()
        doc_hash = f"doc{trial}"
        db.cache_doc(doc_hash, html)

        # queries: mixes of present/absent keywords and phrases of 1-4 words
        q_words = [rng.choice(vocab) for _ in range(rng.randint(0, 3))]
        phrases = []
        for _ in range(rng.randint(0, 2)):
            if n and rng.random() < 0.7:  # phrase lifted from the doc
                start = rng.randrange(n)
                ln = rng.randint(1, 4)
                phrases.append(" ".join(words[start : start + ln]))
            else:
                phrases.append(" ".join(rng.choice(vocab) for _ in range(2)))
        query = " ".join(q_words)

        # the parsed doc words (what extract_summary_text yields) are the
        # ground truth both paths consume
        from spaghettisearch_tpu.text.htmlparse import extract_summary_text

        doc_words = extract_summary_text(html)
        want = _reference_summary(doc_words, query, phrases)
        got = get_summary(db, doc_hash, query, phrases)
        assert got == want, (trial, query, phrases, words)


def test_indexed_summary_text_equals_html_reparse():
    """The doc_summary fast path (written at index time) must produce the
    same summaries as re-parsing the cached HTML (reference behavior)."""
    from datetime import datetime, timezone

    from spaghettisearch_tpu.index.indexer import index_page

    html = (
        b"<html><head><title>t</title></head><body><nav>skip me</nav>"
        b"<p>alpha beta <a href='/x'>link text</a> gamma delta</p>"
        b"<div>epsilon <script>var x;</script> zeta</div></body></html>"
    )
    with_table = Database(None)
    index_page(with_table, html, "http://s.local/a",
               last_modified=datetime(2026, 1, 1, tzinfo=timezone.utc))
    doc_hash = sorted(with_table.doc_info.keys(), key=lambda h: with_table.doc_info.get(h).url)[0]
    # find the real (non-stub) doc
    for h in with_table.doc_info.keys():
        if with_table.doc_info.get(h).url == "http://s.local/a":
            doc_hash = h
    assert with_table.doc_summary.get(doc_hash) == "alpha beta gamma delta epsilon zeta"

    fallback = Database(None)
    fallback.cache_doc(doc_hash, html)  # no doc_summary row: HTML re-parse
    for q in ("gamma", "zeta epsilon", "missing"):
        assert get_summary(with_table, doc_hash, q, []) == get_summary(
            fallback, doc_hash, q, []
        )


def test_summary_cache_invalidated_on_content_change():
    db = Database(None)
    db.cache_doc("d", b"<html><body><p>alpha beta gamma</p></body></html>")
    assert "alpha" in get_summary(db, "d", "alpha", [])
    db.cache_doc("d", b"<html><body><p>delta epsilon zeta</p></body></html>")
    assert "delta" in get_summary(db, "d", "delta", [])


def test_native_renderer_matches_python_property():
    """fastsummary.cpp must be byte-identical to the Python renderer over
    randomized docs and queries (keywords, phrases, unicode, punctuation,
    short docs, no-match fallbacks)."""
    import random

    from spaghettisearch_tpu.retrieval import summary as S

    native = S._native()
    if native is None:
        import pytest

        pytest.skip("native summary renderer unavailable")

    rng = random.Random(42)
    vocab = ["alpha", "beta!", "Gamma", "the-end", "x9", "déjà", "...",
             "a", "", "ZETA", "mix3d", "under_score", "日本語", "c++"]

    def py_render(words, prepared):
        cleaned = [S._clean(w) for w in words]
        first_pos, positions = {}, {}
        for i, wc in enumerate(cleaned):
            if wc not in first_pos:
                first_pos[wc] = i
                positions[wc] = [i]
            else:
                positions[wc].append(i)
        return S._render(words, cleaned, first_pos, positions, *prepared)

    for trial in range(300):
        n = rng.choice([0, 1, 5, 15, 21, 22, 40, 120])
        words = [rng.choice(vocab) for _ in range(n)]
        words = [w for w in words if w]  # split() never yields empty words
        text = " ".join(words)
        qk = rng.randint(0, 3)
        query = " ".join(rng.choice(vocab) for _ in range(qk))
        phrases = []
        if rng.random() < 0.5 and len(words) >= 2:
            i = rng.randrange(len(words) - 1)
            phrases.append(f"{words[i]} {words[i + 1]}")
        if rng.random() < 0.2:
            phrases.append("no such phrase here")
        prepared = S.prepare_summary_query(query, phrases)
        want = py_render(words, prepared)
        got = native.render_summary(text.encode(), S._packed_query(prepared))
        assert got == want, (trial, text, query, phrases, got, want)
