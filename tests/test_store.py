"""Store layer: table roundtrips, durability, batch writes."""

from datetime import datetime, timezone

from spaghettisearch_tpu.store.docinfo import ZERO_TIME, DocInfo
from spaghettisearch_tpu.store.tables import Database


def test_docinfo_roundtrip():
    info = DocInfo(
        url="https://example.com/x",
        page_title=["Hello", "World"],
        mod_date=datetime(2026, 3, 1, 12, 30, tzinfo=timezone.utc),
        page_size=1234,
        children=["c1", "c2"],
        parents={"p1": ["anchor", "text"], "p2": []},
        words_mapping={"w1": 3, "w2": 1},
    )
    again = DocInfo.from_json(info.to_json())
    assert again == info
    assert not info.is_stub
    assert DocInfo(url="u").is_stub
    assert DocInfo(url="u").mod_date == ZERO_TIME


def test_tables_roundtrip_mem():
    db = Database()
    db.inv_title.set("wh", {"dh": [0.5, 1.0, 2.0]})
    assert db.inv_title.get("wh") == {"dh": [0.5, 1.0, 2.0]}
    db.word.set("wh", "hello")
    assert db.word.get("wh") == "hello"
    db.doc_children.set("dh", ["a", "b"])
    assert db.doc_children.get("dh") == ["a", "b"]
    assert db.doc_children.get("missing") is None
    assert len(db.doc_children) == 1
    db.doc_children.delete("dh")
    assert db.doc_children.get("dh") is None


def test_batch_writer():
    db = Database()
    with db.word.batch() as bw:
        for i in range(10):
            bw.set(f"k{i}", f"v{i}")
        # not yet visible pre-flush
        assert db.word.get("k0") is None
    assert db.word.get("k7") == "v7"
    assert len(db.word) == 10


def test_durability(tmp_path):
    root = str(tmp_path / "db")
    db = Database(root)
    db.word.set("k", "v")
    info = DocInfo(url="https://a.b/c")
    db.doc_info.set("dh", info)
    db.cache_doc("dh", b"<html>raw</html>")
    db.close()

    db2 = Database(root)
    assert db2.word.get("k") == "v"
    assert db2.doc_info.get("dh") == info
    assert db2.cached_doc("dh") == b"<html>raw</html>"
    db2.close()


def test_compaction(tmp_path):
    root = str(tmp_path / "db")
    db = Database(root)
    for i in range(100):
        db.word.set(f"k{i}", f"v{i}")
    db.word.delete("k0")
    kv = db.word._kv
    kv.compact()
    db.close()

    db2 = Database(root)
    assert db2.word.get("k0") is None
    assert db2.word.get("k99") == "v99"
    assert len(db2.word) == 99
    db2.close()


def test_log_backend_compact_refuses_foreign_appends(tmp_path):
    from spaghettisearch_tpu.store.kv import LogBackend

    path = str(tmp_path / "t")
    a = LogBackend(path)
    a.set("base", "row")
    a.flush()
    b = LogBackend(path)  # second process appends
    b.set("foreign", "row2")
    b.flush()
    assert a.compact() is False  # refused
    b.close()
    a.close()
    c = LogBackend(path)
    assert c.get("base") == "row"
    assert c.get("foreign") == "row2"
    assert c.compact() is True
    c.close()


def test_bulk_mode_equivalent_and_durable(tmp_path):
    """Bulk write-back indexing must produce byte-identical tables to the
    per-page path, and survive close/reopen on the disk backend."""
    import random
    from datetime import datetime, timezone

    from corpus import make_page
    from spaghettisearch_tpu.index.indexer import index_page

    rng = random.Random(11)
    n = 12
    pages = [make_page(rng, i, n, "http://b.local") for i in range(n)]
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)

    plain = Database(None)
    for url, html in pages:
        index_page(plain, html, url, last_modified=ts)

    root = str(tmp_path / "bulkdb")
    db = Database(root)
    with db.bulk():
        for url, html in pages:
            index_page(db, html, url, last_modified=ts)
        # reads inside bulk mode see the cached writes
        assert len(db.doc_children) == n
    db.close()

    re = Database(root)
    for name in plain.tables:
        a = dict(plain.tables[name].items())
        b = dict(re.tables[name].items())
        if name == "doc_info":
            a = {k: v.to_json() for k, v in a.items()}
            b = {k: v.to_json() for k, v in b.items()}
        assert a == b, name
    re.close()


def test_bulk_delete_tombstone(tmp_path):
    db = Database(str(tmp_path / "tomb"))
    db.word.set("k1", "v1")
    with db.bulk():
        db.word.delete("k1")
        assert db.word.get("k1") is None
        assert "k1" not in db.word
        db.word.set("k2", "v2")
    db.close()
    re = Database(str(tmp_path / "tomb"))
    assert re.word.get("k1") is None
    assert re.word.get("k2") == "v2"
    re.close()


def test_posting_row_fast_dump_matches_json():
    """The inv/raw tables' fast serializer must produce the exact bytes
    json.dumps would: the decode side stays json.loads and on-disk stores
    mix rows written by both paths."""
    import json
    import random

    from spaghettisearch_tpu.store.tables import _dump_posting_row

    rng = random.Random(7)
    rows = [{}, {"ab12": [1.0]}, {"ff": 0.25}]
    for _ in range(200):
        row = {}
        for _ in range(rng.randrange(0, 6)):
            k = "%032x" % rng.getrandbits(128)
            if rng.random() < 0.3:
                row[k] = rng.random()  # raw-shadow shape: bare float
            else:
                n = rng.randrange(1, 8)
                vals = [rng.random() * rng.choice([1, 100, 1e-8])]
                vals += [float(rng.randrange(0, 500)) for _ in range(n - 1)]
                if rng.random() < 0.3:
                    vals.append(-100.0)  # META_POSITION sentinel
                if rng.random() < 0.3:
                    # idf-multiplied rows can carry non-finite weights
                    vals[0] = rng.choice(
                        [float("inf"), float("-inf"), float("nan")]
                    )
                row[k] = vals
        rows.append(row)
    for row in rows:
        assert _dump_posting_row(row) == json.dumps(row)


def test_docs_pack_roundtrip_and_lww(tmp_path):
    """New doc writes land in docs.pack; re-writes are last-writer-wins."""
    root = str(tmp_path / "db")
    db = Database(root)
    db.cache_doc("d1", b"<html>one</html>")
    db.cache_doc("d2", b"<html>two</html>")
    db.cache_doc("d1", b"<html>one-v2</html>")  # re-crawl: newest wins
    assert db.cached_doc("d1") == b"<html>one-v2</html>"
    assert db.cached_doc("d2") == b"<html>two</html>"
    db.close()
    import os as _os

    assert _os.path.exists(_os.path.join(root, "docs.pack"))
    assert not _os.path.isdir(_os.path.join(root, "docs"))  # no per-doc files
    db2 = Database(root)
    assert db2.cached_doc("d1") == b"<html>one-v2</html>"
    assert db2.cached_doc("d2") == b"<html>two</html>"
    assert db2.cached_doc("missing") is None
    db2.close()


def test_docs_pack_prepack_file_fallback(tmp_path):
    """Stores written before the pack existed keep one file per doc under
    docs/<hash>; reads fall back there, and a re-write shadows the file."""
    import os as _os

    root = str(tmp_path / "db")
    _os.makedirs(_os.path.join(root, "docs"))
    with open(_os.path.join(root, "docs", "dold"), "wb") as f:
        f.write(b"<html>legacy</html>")
    db = Database(root)
    assert db.cached_doc("dold") == b"<html>legacy</html>"
    db.cache_doc("dold", b"<html>repacked</html>")
    assert db.cached_doc("dold") == b"<html>repacked</html>"
    db.close()


def test_docs_pack_reopen_sees_other_process_appends(tmp_path):
    """Same contract as the tables: another handle's appends become visible
    at reopen(), not before."""
    root = str(tmp_path / "db")
    reader = Database(root)
    assert reader.cached_doc("d") is None
    writer = Database(root)
    writer.cache_doc("d", b"<html>late</html>")
    writer.close()
    assert reader.cached_doc("d") is None  # index loaded at open
    reader.reopen()
    assert reader.cached_doc("d") == b"<html>late</html>"
    reader.close()


def test_docs_pack_torn_tail(tmp_path):
    """An index line whose payload extends past the pack (torn append) is
    dropped at load; intact earlier entries survive."""
    import os as _os

    root = str(tmp_path / "db")
    db = Database(root)
    db.cache_doc("good", b"<html>ok</html>")
    db.close()
    with open(_os.path.join(root, "docs.pki"), "a", encoding="utf-8") as f:
        f.write("torn 999999 50\n")  # vouches for bytes that never landed
        f.write("halfline 12\n")  # malformed
    db2 = Database(root)
    assert db2.cached_doc("good") == b"<html>ok</html>"
    assert db2.cached_doc("torn") is None
    assert db2.cached_doc("halfline") is None
    db2.close()


def test_bulk_session_restores_gc(tmp_path):
    import gc

    db = Database(str(tmp_path / "db"))
    assert gc.isenabled()
    with db.bulk():
        assert not gc.isenabled()
        with db.bulk():  # nested sessions keep it off until the last exit
            assert not gc.isenabled()
        assert not gc.isenabled()
    assert gc.isenabled()
    db.close()
