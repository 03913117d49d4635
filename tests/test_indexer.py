"""Indexer semantics: posting layout, anchor-text indexing, stubs,
re-index gating, purge on content change."""

from datetime import datetime, timezone

import pytest

from spaghettisearch_tpu.index.indexer import index_page
from spaghettisearch_tpu.store.tables import Database
from spaghettisearch_tpu.utils.hashing import md5_hex

T1 = datetime(2026, 1, 1, tzinfo=timezone.utc)
T2 = datetime(2026, 2, 1, tzinfo=timezone.utc)

PAGE = b"""<html><head><title>Quantum Research Lab</title></head>
<body><p>quantum computing research quantum hardware</p>
<a href="/students">bright students</a>
</body></html>"""

BASE = "http://lab.local"


@pytest.fixture
def db():
    d = Database()
    index_page(d, PAGE, BASE + "/index", last_modified=T1)
    return d


def test_posting_layout(db):
    doc_hash = md5_hex(BASE + "/index")
    # body: "quantum" occurs twice of max-freq 2 -> normTF 1.0
    row = db.inv_body.get(md5_hex("quantum"))
    assert row is not None
    norm_tf, *positions = row[doc_hash]
    assert norm_tf == 1.0
    assert positions == [0.0, 3.0]
    # title: "quantum" normTF 1/1 at position 0
    trow = db.inv_title.get(md5_hex("quantum"))
    assert trow[doc_hash][0] == 1.0
    # word table hydration
    assert db.word.get(md5_hex("quantum")) == "quantum"


def test_docinfo_and_children(db):
    doc_hash = md5_hex(BASE + "/index")
    info = db.doc_info.get(doc_hash)
    assert info.page_title == ["Quantum", "Research", "Lab"]  # raw title fields
    assert info.page_size == len(PAGE)
    child_hash = md5_hex(BASE + "/students")
    assert info.children == [child_hash]
    assert db.doc_children.get(doc_hash) == [child_hash]
    assert md5_hex("quantum") in info.words_mapping


def test_anchor_stub_and_postings(db):
    doc_hash = md5_hex(BASE + "/index")
    child_hash = md5_hex(BASE + "/students")
    stub = db.doc_info.get(child_hash)
    assert stub is not None and stub.is_stub
    assert stub.url == BASE + "/students"
    assert stub.parents == {doc_hash: ["bright", "student"]}
    # anchor text indexed into the *title* table under the child's hash
    # with the -100 sentinel position
    row = db.inv_title.get(md5_hex("bright"))
    assert row[child_hash] == [1.0, -100.0]


def test_reindex_skipped_when_not_newer(db):
    doc_hash = md5_hex(BASE + "/index")
    before = db.doc_info.get(doc_hash)
    index_page(db, b"<html><title>changed</title></html>", BASE + "/index", last_modified=T1)
    assert db.doc_info.get(doc_hash) == before  # same timestamp: skipped


def test_reindex_purges_changed_content(db):
    doc_hash = md5_hex(BASE + "/index")
    new_page = b"""<html><head><title>Fusion Lab</title></head>
<body><p>fusion energy research</p></body></html>"""
    index_page(db, new_page, BASE + "/index", last_modified=T2)

    # old body words gone for this doc, new ones present
    qrow = db.inv_body.get(md5_hex("quantum"))
    assert qrow is None or doc_hash not in qrow
    assert doc_hash in db.inv_body.get(md5_hex("fusion"))
    # old title postings purged
    trow = db.inv_title.get(md5_hex("quantum"))
    assert trow is None or doc_hash not in trow
    # child's parent link + anchor postings removed
    child_hash = md5_hex(BASE + "/students")
    child = db.doc_info.get(child_hash)
    assert doc_hash not in child.parents
    brow = db.inv_title.get(md5_hex("bright"))
    assert brow is None or child_hash not in brow
    info = db.doc_info.get(doc_hash)
    assert info.page_title == ["Fusion", "Lab"]
    assert info.mod_date == T2


def test_anchor_merges_child_title(db):
    """When the child already has a DocInfo with a title, anchor postings
    blend anchor counts with raw-title positions (indexer.go:240-291)."""
    child_url = BASE + "/students"
    child_page = b"<html><head><title>student portal</title></head><body>x</body></html>"
    index_page(db, child_page, child_url, last_modified=T1)
    # re-index parent (newer) so the anchor path sees a real child DocInfo
    page2 = PAGE.replace(b"quantum hardware", b"quantum devices")
    index_page(db, page2, BASE + "/index", last_modified=T2)

    child_hash = md5_hex(child_url)
    row = db.inv_title.get(md5_hex("student"))
    # anchor token "student" (stemmed) + raw title word "student" at pos 0:
    # count 2, maxFreq 2 -> normTF 1.0; positions [-100, 0]
    assert row[child_hash] == [1.0, -100.0, 0.0]


def test_parent_url_recorded():
    db = Database()
    index_page(db, PAGE, BASE + "/index", last_modified=T1, parent_url=BASE + "/root")
    info = db.doc_info.get(md5_hex(BASE + "/index"))
    assert md5_hex(BASE + "/root") in info.parents


def test_randomized_reindex_matches_fresh_build():
    """Property test for the incremental purge/re-index path: mutate random
    pages of a crawled corpus, re-index them, and the store must equal a
    from-scratch index of the final corpus state (reference semantics:
    checkAndUpdate purge + rewrite, indexer.go:420-641)."""
    import random
    from datetime import datetime, timedelta, timezone

    from corpus import make_page
    from spaghettisearch_tpu.store.tables import Database

    rng = random.Random(99)
    n = 18
    base = "http://mut.local"
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    pages = {}
    for i in range(n):
        url, html = make_page(rng, i, n, base)
        pages[url] = html

    # incremental store: index v1, then mutate 6 pages and re-index them
    inc = Database(None)
    with inc.bulk():
        for url, html in pages.items():
            index_page(inc, html, url, last_modified=t0)
        mutated = rng.sample(sorted(pages), 6)
        rng2 = random.Random(7)
        for k, url in enumerate(mutated):
            i = int(url.rsplit("page", 1)[1])
            _, html = make_page(rng2, i, n, base)
            if k < 3:
                # force meta-bearing mutations: stale meta-word title
                # postings must be purged (deliberate fix of the
                # reference's Page_title-only purge, indexer.go:452-472 —
                # see _purge_old)
                html = html.replace(
                    b"</title>",
                    b'</title><meta name="description" content="zanzibar melody">',
                    1,
                )
            pages[url] = html
            index_page(inc, html, url, last_modified=t0 + timedelta(days=1))

    # fresh store: index the FINAL state once
    fresh = Database(None)
    with fresh.bulk():
        for url, html in pages.items():
            ts = t0 + timedelta(days=1) if url in mutated else t0
            index_page(fresh, html, url, last_modified=ts)

    # reference quirk: anchor writes are last-writer-wins per (word, child)
    # and can also overwrite the child's OWN title entry with merged
    # anchor+title positions (indexer.go:240-291 `value[kid] = ...`), so any
    # doc that has ever been anchored is order-dependent between incremental
    # and fresh builds. Title rows are compared only for never-anchored docs;
    # body/children/word/doc_info are deterministic and compared in full.
    anchored = {
        d for store in (inc, fresh)
        for d, info in store.doc_info.items() if info.parents
    }

    def strip_anchored(row):
        return {d: v for d, v in row.items() if d not in anchored}

    for name in ("inv_title", "inv_body", "word", "doc_children"):
        a = dict(inc.tables[name].items())
        b = dict(fresh.tables[name].items())
        if name == "inv_title":
            a = {k: v for k, v in ((k, strip_anchored(v)) for k, v in a.items()) if v}
            b = {k: v for k, v in ((k, strip_anchored(v)) for k, v in b.items()) if v}
        assert a.keys() == b.keys(), name
        for k in a:
            if name.startswith("inv"):
                assert a[k].keys() == b[k].keys(), (name, k)
                for doc in a[k]:
                    assert a[k][doc] == b[k][doc], (name, k, doc)
            else:
                assert a[k] == b[k], (name, k)
    # DocInfos: equal up to mod dates
    ai = {k: v.to_json() for k, v in inc.doc_info.items()}
    bi = {k: v.to_json() for k, v in fresh.doc_info.items()}
    assert ai == bi


def test_meta_word_purge_on_reindex(db):
    """Changed <meta> terms must not leave stale title-section postings.

    The reference leaks here (its purge derives the old title vocabulary
    from Page_title only, indexer.go:452-472, while meta terms are indexed
    into the title table, parser.go:59-73); _purge_old re-tokenizes the
    cached HTML instead — a documented deliberate fix."""
    url = BASE + "/meta"
    v1 = (b"<html><head><title>stable title</title>"
          b'<meta name="description" content="ephemeral keyword">'
          b"</head><body><p>body words</p></body></html>")
    v2 = (b"<html><head><title>stable title</title>"
          b'<meta name="description" content="replacement">'
          b"</head><body><p>body words</p></body></html>")
    index_page(db, v1, url, last_modified=T1)
    doc_hash = md5_hex(url)
    assert doc_hash in (db.inv_title.get(md5_hex("ephemer")) or {})
    index_page(db, v2, url, last_modified=T2)
    row = db.inv_title.get(md5_hex("ephemer")) or {}
    assert doc_hash not in row, "stale meta-word posting survived re-index"
    assert doc_hash in (db.inv_title.get(md5_hex("replac")) or {})
