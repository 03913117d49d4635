"""Native C++ KV backend: build, roundtrip, durability, compaction."""

import pytest

from spaghettisearch_tpu.store.tables import Database

native = pytest.importorskip("spaghettisearch_tpu.store.native_kv")

if not native.native_available():
    pytest.skip("libfastkv.so not buildable", allow_module_level=True)


def test_roundtrip(tmp_path):
    b = native.NativeBackend(str(tmp_path / "t"))
    assert len(b) == 0
    b.set("k1", "v1")
    b.set("k2", '{"json": [1,2,3]}')
    assert b.get("k1") == "v1"
    assert b.get("missing") is None
    assert len(b) == 2
    b.delete("k1")
    assert b.get("k1") is None
    b.set_many([("a", "1"), ("b", "2"), ("c", "3")])
    assert dict(b.items()) == {"k2": '{"json": [1,2,3]}', "a": "1", "b": "2", "c": "3"}
    b.close()


def test_durability_and_compaction(tmp_path):
    path = str(tmp_path / "t")
    b = native.NativeBackend(path)
    for i in range(1000):
        b.set(f"k{i}", f"value-{i}" * 5)
    b.delete("k0")
    b.flush()
    b.close()

    b2 = native.NativeBackend(path)
    assert len(b2) == 999
    assert b2.get("k0") is None
    assert b2.get("k500") == "value-500" * 5
    b2.compact()
    b2.close()

    b3 = native.NativeBackend(path)
    assert len(b3) == 999
    assert b3.get("k999") == "value-999" * 5
    b3.close()


def test_unicode(tmp_path):
    b = native.NativeBackend(str(tmp_path / "t"))
    b.set("clé", "vàlüe ünïcode ✓")
    assert b.get("clé") == "vàlüe ünïcode ✓"
    b.close()


def test_database_native_backend(tmp_path):
    db = Database(str(tmp_path / "db"), backend="native")
    assert db.backend_kind == "native"
    db.word.set("wh", "hello")
    db.inv_title.set("wh", {"dh": [1.0, -100.0]})
    db.flush()
    db.close()

    db2 = Database(str(tmp_path / "db"), backend="native")
    assert db2.word.get("wh") == "hello"
    assert db2.inv_title.get("wh") == {"dh": [1.0, -100.0]}
    db2.close()


def test_compact_refuses_foreign_appends(tmp_path):
    """A reader/server handle must never compact away rows appended by a
    second process (crawl-subprocess-then-/refresh workflow): compaction
    rewrites data.log from the handle's in-RAM map, which is stale."""
    path = str(tmp_path / "t")
    server = native.NativeBackend(path)
    server.set("base", "row")
    server.flush()

    # a second handle plays the crawler subprocess appending new rows
    crawler = native.NativeBackend(path)
    crawler.set("crawled", "fresh-row")
    crawler.flush()

    assert server.compact() is False  # refused: foreign append detected
    crawler.set("crawled2", "fresh-row-2")
    crawler.flush()
    crawler.close()
    server.close()

    b = native.NativeBackend(path)
    assert b.get("base") == "row"
    assert b.get("crawled") == "fresh-row"
    assert b.get("crawled2") == "fresh-row-2"
    # the single remaining writer may compact
    assert b.compact() is True
    b.close()
    b2 = native.NativeBackend(path)
    assert len(b2) == 3
    b2.close()


def test_torn_tail_record_recovered(tmp_path):
    path = str(tmp_path / "t")
    b = native.NativeBackend(path)
    b.set("good", "value")
    b.flush()
    b.close()
    import os

    log = os.path.join(path, "data.log")
    with open(log, "ab") as f:
        f.write(b"\x00\x10\x00\x00\x00")  # truncated record header
    b2 = native.NativeBackend(path)
    assert b2.get("good") == "value"
    assert len(b2) == 1
    b2.close()


def test_copy_native_handles_buffers_past_2gib():
    """ctypes.string_at takes a C int size, so >= 2 GiB exports raised
    'Negative size passed to PyBytes_FromStringAndSize' (hit by the 1M-doc
    corpus build: 77M postings x 32-byte hashes). _copy_native must not
    share that limit."""
    import ctypes

    import numpy as np

    # small-buffer equivalence with the string_at formulation
    src = np.arange(1000, dtype=np.float64)
    ptr = src.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    out = native._copy_native(ptr, src.nbytes, np.float64, len(src))
    assert np.array_equal(out, src)
    out[0] = -1.0  # a copy, not a view
    assert src[0] == 0.0

    # past the 2 GiB string_at wall (this box has 125 GB RAM; the copy is
    # one memcpy, ~1 s)
    n = (2**31 + (8 << 20)) // 8
    big = np.zeros(n, dtype=np.float64)
    big[0], big[-1] = 1.5, 2.5
    bptr = big.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    bout = native._copy_native(bptr, big.nbytes, np.float64, n)
    assert bout.shape == (n,) and bout[0] == 1.5 and bout[-1] == 2.5
