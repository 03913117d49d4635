"""Corpus-scale crash/recovery soak (VERDICT r4 #7).

The WAL torn-tail recovery, docs-pack torn-tail drop, and hydration-sidecar
fingerprint invalidation are unit-tested; this exercises them at 1M-corpus
scale against a copy of the bench store (the reference's durability trade
is SyncWrites=false, /root/reference/database/database.go:194-195 — ours is
the C++ log engine's WAL + load-time tail scan):

  phase A — kill -9 a bulk-indexing crawler subprocess mid-flush, reopen
            the store, verify recovery + integrity probes, then append
            again (the log tail must stay writable after recovery).
  phase B — start the real serving stack on the copy, kill -9 the server
            MID-/refresh (while the off-lock snapshot rebuild walks the
            store), restart it, verify it comes up and serves; the store
            mutation also flips the sidecar fingerprint, so the restart
            must detect the stale hydration.npz instead of serving stale
            records. Phase B starts the 1M server twice (~10 min each on
            the TPU relay) — run it when that budget is acceptable.

python experiments/crash_recovery.py [--phase a|b|all] [--skip-copy]
       [--src .bench/corpus1000k] [--work /tmp/crash1m]
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

CRAWLER_SNIPPET = """
import sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo!r} + "/tests")
import jax; jax.config.update("jax_platforms", "cpu")
import random
from datetime import datetime, timezone
from corpus import make_page
from spaghettisearch_tpu.index.indexer import index_page
from spaghettisearch_tpu.store.tables import Database

db = Database({root!r})
rng = random.Random(77)
ts = datetime(2026, 3, 1, tzinfo=timezone.utc)
i = 5_000_000
with db.bulk():
    while True:
        for _ in range(50):
            url, html = make_page(rng, i, 10_000_000, "http://crash.local")
            index_page(db, html, url, last_modified=ts)
            i += 1
        db.flush_bulk()
        db.flush()
        print("flushed", i, flush=True)
"""


def _copy(src: str, work: str, with_snapshot: bool) -> None:
    t0 = time.perf_counter()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    shutil.copytree(os.path.join(src, "store"), os.path.join(work, "store"))
    if with_snapshot:
        shutil.copytree(
            os.path.join(src, "snapshot"), os.path.join(work, "snapshot")
        )
    print(f"copied {src} -> {work} in {time.perf_counter() - t0:.0f}s",
          flush=True)


def phase_a(work: str, repo: str) -> dict:
    store = os.path.join(work, "store")
    code = CRAWLER_SNIPPET.format(repo=repo, root=store)
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True,
        cwd=repo,
    )
    flushes = 0
    t_dead = time.monotonic() + 600
    last = ""
    while flushes < 2 and time.monotonic() < t_dead:
        line = proc.stdout.readline()
        if not line:
            break
        last = line.strip()
        if line.startswith("flushed"):
            flushes += 1
    assert flushes >= 2, f"crawler never flushed: {last!r}"
    # kill -9 a beat into the NEXT flush cycle: the bulk cache is mid-write
    time.sleep(0.35)
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    print(f"crawler SIGKILLed after {flushes} flushes", flush=True)

    # recovery: reopen + integrity probes
    import jax

    jax.config.update("jax_platforms", "cpu")
    from spaghettisearch_tpu.store.tables import Database

    t0 = time.perf_counter()
    db = Database(store)
    open_s = time.perf_counter() - t0
    # 1) pre-existing docs still readable through the docs pack
    info_keys = db.doc_info.keys()
    n_docs = len(info_keys)
    assert n_docs >= 1_000_000, f"doc_info lost rows: {n_docs}"
    ok_docs = 0
    for h in info_keys[:50]:
        if db.cached_doc(h):
            ok_docs += 1
    # 2) appended-before-crash rows are either fully present or dropped at
    #    the torn tail — spot-check decode of the last committed entries
    sample = info_keys[-20:]
    for h in sample:
        row = db.doc_info.get(h)
        assert row is not None
    # 3) the log tail stays APPENDABLE after recovery
    from datetime import datetime, timezone

    from corpus import make_page
    from spaghettisearch_tpu.index.indexer import index_page
    import random

    rng = random.Random(99)
    url, html = make_page(rng, 6_000_000, 10_000_000, "http://crash.local")
    index_page(db, html, url, last_modified=datetime(2026, 3, 2,
                                                     tzinfo=timezone.utc))
    db.flush()
    n_after = len(db.doc_info.keys())
    assert n_after >= n_docs + 1, "post-recovery append lost"
    db.close()
    res = {"phase": "a", "flushes_before_kill": flushes, "docs": n_docs,
           "reopen_s": round(open_s, 1), "docs_pack_ok": ok_docs,
           "post_recovery_append": True}
    print(json.dumps(res), flush=True)
    return res


def phase_b(work: str, repo: str, port: int = 8833) -> dict:
    import urllib.request

    store = os.path.join(work, "store")
    snap_dir = os.path.join(work, "snapshot")
    sidecar = os.path.join(snap_dir, "hydration.npz")
    sidecar_mtime0 = os.path.getmtime(sidecar) if os.path.exists(sidecar) else None

    def start_server():
        log = open("/tmp/crash_server.log", "wb")
        p = subprocess.Popen(
            [sys.executable, "-m", "spaghettisearch_tpu.cli.server",
             "--db", store, "--snapshot", snap_dir, "--port", str(port)],
            stdout=log, stderr=subprocess.STDOUT, cwd=repo,
        )
        deadline = time.monotonic() + 3600
        while time.monotonic() < deadline:
            if p.poll() is not None:
                raise RuntimeError("server died; see /tmp/crash_server.log")
            with open("/tmp/crash_server.log", "rb") as f:
                if b"Server is running" in f.read():
                    return p
            time.sleep(5)
        raise RuntimeError("server never came up")

    t0 = time.perf_counter()
    proc = start_server()
    print(f"server up in {time.perf_counter() - t0:.0f}s", flush=True)

    # mutate the store (a real append) so the refresh has new rows AND the
    # sidecar fingerprint goes stale
    code = CRAWLER_SNIPPET.format(repo=repo, root=store).replace(
        "while True:", "for _one in range(1):"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900, cwd=repo)
    assert out.returncode == 0, out.stderr[-800:]
    print("appended 50 docs", flush=True)

    # fire /refresh and SIGKILL the server while the off-lock snapshot
    # rebuild is walking the store (the 1M rebuild takes minutes)
    import threading

    def fire():
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/refresh", data=b"{}",
                headers={"Content-Type": "application/json"},
            )
            urllib.request.urlopen(req, timeout=1800).read()
        except Exception:  # noqa: BLE001 — the kill races the response
            pass

    th = threading.Thread(target=fire, daemon=True)
    th.start()
    time.sleep(20)  # well inside the rebuild window
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    print("server SIGKILLed mid-refresh", flush=True)

    # restart: must recover the store, detect the stale sidecar (store
    # fingerprint changed), and serve
    t0 = time.perf_counter()
    proc = start_server()
    up2_s = time.perf_counter() - t0
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=json.dumps({"query": "algorithm database"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            rows = json.loads(resp.read())
        assert rows, "no results after crash-restart"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60
        ) as resp:
            hz = json.loads(resp.read())
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except Exception:  # noqa: BLE001
            proc.kill()
    sidecar_mtime1 = os.path.getmtime(sidecar) if os.path.exists(sidecar) else None
    res = {"phase": "b", "restart_up_s": round(up2_s, 0),
           "docs_served": hz.get("docs"), "results_ok": True,
           "sidecar_rebuilt": (
               sidecar_mtime0 is None or sidecar_mtime1 is None
               or sidecar_mtime1 > sidecar_mtime0
           )}
    print(json.dumps(res), flush=True)
    return res


def main() -> None:
    phase = "a"
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
    src = ".bench/corpus1000k"
    if "--src" in sys.argv:
        src = sys.argv[sys.argv.index("--src") + 1]
    work = "/tmp/crash1m"
    if "--work" in sys.argv:
        work = sys.argv[sys.argv.index("--work") + 1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--skip-copy" not in sys.argv:
        _copy(src, work, with_snapshot=phase in ("b", "all"))
    results = []
    if phase in ("a", "all"):
        results.append(phase_a(work, repo))
    if phase in ("b", "all"):
        results.append(phase_b(work, repo))
    print(json.dumps({"crash_recovery": results}), flush=True)


if __name__ == "__main__":
    main()
