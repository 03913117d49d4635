"""Sharded-serving soak at half-million-doc scale (BASELINE.md ladder rung
5 / VERDICT r2 weak #5): a ShardedQueryEngine served over the virtual
8-device CPU mesh, concurrent HTTP queries + wordlist polling + an
append-subprocess -> /refresh loop.

The corpus is written straight into the store (synthetic rows, not crawled
HTML): this soak exercises SERVING at scale — snapshot/ShardedIndex
rebuild, scorer reuse across refreshes, hydration at >prewarm scale, the
rank/refresh lock dance — not the indexer (the crawled-corpus soak.py
covers that end).

python experiments/soak_sharded.py [--seconds 180] [--docs 524288]

--corpus1m (VERDICT r4 #8): soak against the REAL 1M bench corpus
(.bench/corpus1000k) instead of the synthetic fixture — the store is
COPIED to /tmp first so the append + /refresh never dirty the bench
corpus (its BUILT marker and hydration sidecar must stay valid for
bench.py), and the server reuses the bench snapshot + sidecar for
startup. The /refresh then rebuilds the snapshot + 8-shard index from
the appended store on the 1-core CPU mesh (~10-15 min) — the soak runs
its query/wordlist load through the whole rebuild window.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")

ROOT = "/tmp/soak_sharded_db"
PORT = 8799
N_WORDS = 20_000


def build_synth_store(root: str, n_docs: int, start: int = 0,
                      seed: int = 0, db=None) -> None:
    """Write `n_docs` synthetic docs (ids start..start+n_docs) directly into
    the store: Zipf body/title postings, DocInfo, magnitudes, rank rows,
    summaries. Weight = normTF (idf omitted — serving math doesn't require
    weighted rows, and the soak checks behavior, not ranking quality)."""
    import numpy as np

    from spaghettisearch_tpu.store.docinfo import DocInfo
    from spaghettisearch_tpu.store.tables import Database
    from spaghettisearch_tpu.utils.hashing import md5_hex
    from datetime import datetime, timezone

    rng = np.random.default_rng(seed + start)
    own_db = db is None
    if own_db:
        db = Database(root)
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)

    vocab = [f"w{i:05d}" for i in range(N_WORDS)]
    whash = [md5_hex(w) for w in vocab]
    probs = 1.0 / np.arange(1, N_WORDS + 1) ** 1.05
    probs /= probs.sum()

    k_body, k_title = 10, 2
    body = rng.choice(N_WORDS, size=(n_docs, k_body), p=probs)
    title = rng.choice(N_WORDS, size=(n_docs, k_title), p=probs)
    doc_urls = [f"http://synth.local/d{start + i}" for i in range(n_docs)]
    doc_hash = [md5_hex(u) for u in doc_urls]

    t0 = time.perf_counter()
    with db.bulk():
        if start == 0:
            db.topic_meta.set("General", {"numPages": float(n_docs), "wordCount": 1.0})
            with db.word.batch() as bw:
                for wh, w in zip(whash, vocab):
                    bw.set(wh, w)

        # cap per-word df like a stopword-filtered crawl (synth_snapshot's
        # max_df rationale): an uncapped Zipf head word reaches df ~293k at
        # 512k docs, which makes every phrase-matcher shape (E = 2*max_df)
        # intractable on the 1-core CPU mesh and unrealistic vs real corpora
        max_df = 16_384
        mag_t = np.zeros(n_docs)
        mag_b = np.zeros(n_docs)
        for section, mat, mag in (("title", title, mag_t), ("body", body, mag_b)):
            rows: dict[str, dict] = {}
            full: set[int] = set()
            inv = db.inverted(section)
            for i in range(n_docs):
                terms, counts = np.unique(mat[i], return_counts=True)
                max_f = counts.max()
                dh = doc_hash[i]
                for wid, c in zip(terms, counts):
                    wid = int(wid)
                    w = float(c) / float(max_f)
                    mag[i] += w * w
                    if wid in full:
                        continue
                    row = rows.setdefault(wid, {})
                    if len(row) >= max_df:
                        full.add(wid)
                        continue
                    row[dh] = [w, float(i % 50)]
            with inv.batch() as bw:
                for wid, row in rows.items():
                    old = inv.get(whash[wid])
                    if old:
                        old.update(row)
                        row = old
                    bw.set(whash[wid], row)
        np.sqrt(mag_t, out=mag_t)
        np.sqrt(mag_b, out=mag_b)

        with db.doc_info.batch() as bi, db.doc_magnitude.batch() as bm, \
                db.doc_rank.batch() as br, db.doc_summary.batch() as bs, \
                db.doc_children.batch() as bc:
            for i in range(n_docs):
                dh = doc_hash[i]
                terms, counts = np.unique(body[i], return_counts=True)
                bi.set(dh, DocInfo(
                    url=doc_urls[i],
                    page_title=[vocab[int(t)] for t in title[i]],
                    mod_date=ts,
                    page_size=512,
                    children=[],
                    parents={},
                    words_mapping={
                        whash[int(t)]: int(c) for t, c in zip(terms, counts)
                    },
                ))
                bm.set(dh, {"title": float(mag_t[i]), "body": float(mag_b[i])})
                br.set(dh, {"General": 1.0 / max(n_docs, 1)})
                bs.set(dh, " ".join(vocab[int(t)] for t in body[i]))
                bc.set(dh, [])
    if own_db:
        db.flush()
        db.close()
    print(f"wrote {n_docs} docs (start={start}) in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


APPEND_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
from experiments.soak_sharded import build_synth_store
build_synth_store({root!r}, {count}, start={start})
"""

SERVER_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
sys.argv = ["server", "--db", {root!r}, "--port", "{port}",
            "--meshShards", "8", "--noWarmup",
            # a cold lazily-compiled 1M program on the 1-core CPU mesh can
            # hold its batch >10 min (measured 634 s dispatch) — the soak
            # exercises liveness, not compile latency
            "--resultTimeoutS", "1500"]
if {snapshot!r}:
    sys.argv += ["--snapshot", {snapshot!r}]
# --noWarmup: the soak's 1-core CPU mesh compiles lazily (in-process jit
# cache); the full warm walk at 512k docs costs tens of minutes of host
# time and exists for the remote-TPU relay's compile/settle economics
from spaghettisearch_tpu.cli.server import main
main()
"""


def main() -> None:
    seconds = 180.0
    n_docs = 524_288
    corpus1m = "--corpus1m" in sys.argv
    if "--seconds" in sys.argv:
        seconds = float(sys.argv[sys.argv.index("--seconds") + 1])
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side build only
    global ROOT
    snapshot_dir = None
    if corpus1m:
        # real 1M crawl-built bench corpus: COPY the store (the append +
        # refresh must never dirty .bench — BUILT marker + sidecar), reuse
        # the bench snapshot + hydration sidecar read-only for startup
        bench_root = os.path.join(repo, ".bench", "corpus1000k")
        if not os.path.exists(os.path.join(bench_root, "BUILT.json")):
            raise SystemExit("--corpus1m needs .bench/corpus1000k built")
        ROOT = "/tmp/soak1m_store"
        snapshot_dir = os.path.join(bench_root, "snapshot")
        if not os.path.exists(os.path.join(ROOT, "BUILT")):
            shutil.rmtree(ROOT, ignore_errors=True)
            t0 = time.perf_counter()
            shutil.copytree(os.path.join(bench_root, "store"), ROOT)
            open(os.path.join(ROOT, "BUILT"), "w").write("1m-copy")
            print(f"store copied in {time.perf_counter() - t0:.0f}s",
                  flush=True)
        n_docs = 1_000_000
    elif not os.path.exists(os.path.join(ROOT, "BUILT")):
        shutil.rmtree(ROOT, ignore_errors=True)
        build_synth_store(ROOT, n_docs)
        open(os.path.join(ROOT, "BUILT"), "w").write(str(n_docs))
    print("fixture store ready", flush=True)

    log = open("/tmp/soak_sharded_server.log", "wb")
    proc = subprocess.Popen(
        [sys.executable, "-c",
         SERVER_SNIPPET.format(repo=repo, root=ROOT, port=PORT,
                               snapshot=snapshot_dir)],
        stdout=log, stderr=subprocess.STDOUT, cwd=repo,
    )
    lat: list[float] = []
    try:
        deadline = time.monotonic() + 3000
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError("server died; see /tmp/soak_sharded_server.log")
            with open("/tmp/soak_sharded_server.log", "rb") as f:
                if b"Server is running" in f.read():
                    break
            time.sleep(5)
        else:
            raise RuntimeError("server never came up")
        print("server up", flush=True)

        errors: list[str] = []
        counts = {"queries": 0, "wordlists": 0, "refreshes": 0}
        stop = threading.Event()
        terms = ["w00001", "w00040 w00100", "w00002 w01000 w12345",
                 '"w00003 w00007"', "w19999", "nonexistentzz",
                 '"w00005" w00050']
        if corpus1m:
            # bench vocab drops the Zipf head (<w00040 have df 0): keep a
            # couple of zero-hit probes, put real weight on live terms
            terms = ["w00040", "w00100 w00055", '"w00041 w00077"',
                     "w12345 w00300", "w19999", "nonexistentzz",
                     '"w00050" w00060', "w00042 w00043 w00044 w00045"]

        def qworker(i: int) -> None:
            import random as _r

            r = _r.Random(i)
            while not stop.is_set():
                q = r.choice(terms)
                try:
                    t0 = time.monotonic()
                    req = urllib.request.Request(
                        f"http://127.0.0.1:{PORT}/query",
                        data=json.dumps({"query": q}).encode(),
                        headers={"Content-Type": "application/json"},
                    )
                    with urllib.request.urlopen(req, timeout=1800) as resp:
                        json.load(resp)
                    lat.append(time.monotonic() - t0)
                    counts["queries"] += 1
                except Exception as e:  # noqa: BLE001
                    errors.append(f"query {q!r}: {type(e).__name__}: {e}")

        def wworker() -> None:
            while not stop.is_set():
                try:
                    with urllib.request.urlopen(
                        f"http://127.0.0.1:{PORT}/wordlist/w0001", timeout=1800
                    ) as resp:
                        json.load(resp)
                    counts["wordlists"] += 1
                except Exception as e:  # noqa: BLE001
                    errors.append(f"wordlist: {type(e).__name__}: {e}")
                stop.wait(5.0)

        # sequential shape-warm pass BEFORE concurrent load: with --noWarmup
        # the first query of each program shape compiles lazily, and on the
        # oversubscribed 1-core mesh a multi-minute compile starves any
        # collective already executing past XLA's CPU rendezvous watchdog
        # (~40 s), which FATALLY aborts the process (measured round 4:
        # "Termination timeout for all gather" -> check-failure). One query
        # at a time compiles with nothing else in flight; the /query_batch
        # pass warms the combined (keyword+phrase) batch shapes the
        # concurrent phase will form.
        for q in terms:
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{PORT}/query",
                    data=json.dumps({"query": q}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=1800) as resp:
                    json.load(resp)
                print(f"warm {q!r} ok", flush=True)
            except Exception as e:  # noqa: BLE001
                errors.append(f"warm {q!r}: {type(e).__name__}: {e}")
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{PORT}/query_batch",
                data=json.dumps({"queries": terms}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=1800) as resp:
                json.load(resp)
            print("warm batch ok", flush=True)
        except Exception as e:  # noqa: BLE001
            errors.append(f"warm batch: {type(e).__name__}: {e}")
        print("shape-warm pass done", flush=True)

        base = n_docs
        if corpus1m:
            # append BEFORE the load starts: opening the 14 GB store copy
            # in a subprocess while the query load splits the single core
            # blew a 900 s timeout (run 4). The discipline under test is
            # the REFRESH under load, not the append under load — the
            # append runs uncontended, then /refresh fires mid-load below.
            code = APPEND_SNIPPET.format(repo=repo, root=ROOT,
                                         count=2000, start=base)
            try:
                out = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True,
                    text=True, timeout=3600, cwd=repo,
                )
                if out.returncode != 0:
                    errors.append("append failed: " + out.stderr[-500:])
                else:
                    base += 2000
                    print("append done (pre-load)", flush=True)
            except subprocess.TimeoutExpired:
                errors.append("append timed out")

        threads = [threading.Thread(target=qworker, args=(i,)) for i in range(6)]
        threads.append(threading.Thread(target=wworker))
        for t in threads:
            t.start()

        t_end = time.monotonic() + seconds

        def one_refresh() -> bool:
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{PORT}/refresh", data=b"{}",
                    headers={"Content-Type": "application/json"},
                )
                # corpus1m: /refresh now pays the full shape-warm walk
                # UPFRONT (off-lock) when the jit signature changed —
                # sharded_engine.prepare_refresh, round 5 — instead of
                # leaking lazy compiles into the query path; on the 1-core
                # virtual mesh that walk is tens of minutes of compiles
                with urllib.request.urlopen(
                    req, timeout=9000 if corpus1m else 2500
                ) as resp:
                    r = json.load(resp)
                    assert r.get("ok"), r
                counts["refreshes"] += 1
                print(f"refresh #{counts['refreshes']}: docs={r['docs']} "
                      f"lock={r['lock_seconds']}s queries={counts['queries']}",
                      flush=True)
                return True
            except Exception as e:  # noqa: BLE001
                errors.append(f"refresh: {type(e).__name__}: {e}")
                return False

        if corpus1m:
            # one refresh-under-load over the appended store; the query
            # threads hammer the server through the whole rebuild window
            one_refresh()
            while time.monotonic() < t_end:
                time.sleep(1.0)
        else:
            while time.monotonic() < t_end:
                code = APPEND_SNIPPET.format(repo=repo, root=ROOT,
                                             count=2000, start=base)
                try:
                    out = subprocess.run(
                        [sys.executable, "-c", code], capture_output=True,
                        text=True, timeout=900, cwd=repo,
                    )
                except subprocess.TimeoutExpired:
                    errors.append("append timed out")
                    break
                if out.returncode != 0:
                    errors.append("append failed: " + out.stderr[-500:])
                    break
                base += 2000
                if not one_refresh():
                    break

        stop.set()
        for t in threads:
            t.join(timeout=1850)
        lat.sort()
        p50 = lat[len(lat) // 2] if lat else None
        p99 = lat[int(len(lat) * 0.99)] if lat else None
        print(json.dumps({
            "counts": counts, "errors": errors[:10], "n_errors": len(errors),
            "p50_s": round(p50, 3) if p50 else None,
            "p99_s": round(p99, 3) if p99 else None,
            "docs_final": base,
        }), flush=True)
        if errors:
            sys.exit(1)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except Exception:  # noqa: BLE001
            proc.kill()


if __name__ == "__main__":
    main()
