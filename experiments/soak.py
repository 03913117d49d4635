"""Serving soak: concurrent queries + wordlist polling + crawl-subprocess ->
/refresh loop against a disk-backed store (the CLAUDE.md invariant check
after touching serve/, store/ or refresh paths).

python experiments/soak.py [--seconds 150]
"""

import json
import os
import random
import shutil
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

ROOT = "/tmp/soakdb"
PORT = 8797

APPEND_SNIPPET = """
import sys, random
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo!r} + "/tests")
import jax; jax.config.update("jax_platforms", "cpu")
from datetime import datetime, timezone
from corpus import make_page
from spaghettisearch_tpu.index.indexer import index_page
from spaghettisearch_tpu.store.tables import Database
db = Database({root!r})
rng = random.Random({seed})
ts = datetime(2026, 2, 1, tzinfo=timezone.utc)
base = {base}
for i in range(base, base + 10):
    url, html = make_page(rng, i, 10_000, "http://soak.local")
    index_page(db, html, url, last_modified=ts)
db.flush(); db.close()
print("appended", base)
"""


def main() -> None:
    seconds = 150.0
    if "--seconds" in sys.argv:
        seconds = float(sys.argv[sys.argv.index("--seconds") + 1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    shutil.rmtree(ROOT, ignore_errors=True)
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side build only
    import random as _r

    from corpus import make_page
    from datetime import datetime, timezone

    from spaghettisearch_tpu.index.indexer import index_page
    from spaghettisearch_tpu.ops.pagerank import update_pagerank
    from spaghettisearch_tpu.ops.weighting import update_term_weights
    from spaghettisearch_tpu.store.tables import Database

    rng = _r.Random(3)
    db = Database(ROOT)
    db.topic_meta.set("G", {"numPages": 100.0, "wordCount": 1.0})
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    for i in range(120):
        url, html = make_page(rng, i, 10_000, "http://soak.local")
        index_page(db, html, url, last_modified=ts)
    update_pagerank(db)
    update_term_weights(db, "title")
    update_term_weights(db, "body")
    db.flush()
    db.close()
    print("fixture store built", flush=True)

    log = open("/tmp/soak_server.log", "wb")
    cmd = [sys.executable, "-m", "spaghettisearch_tpu.cli.server",
           "--db", ROOT, "--port", str(PORT)]
    if "--cpu" in sys.argv:  # relay outages: soak the serving stack on CPU
        cmd += ["--platform", "cpu"]
    proc = subprocess.Popen(
        cmd, stdout=log, stderr=subprocess.STDOUT, cwd=repo,
    )
    try:
        deadline = time.monotonic() + 1500
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError("server died; see /tmp/soak_server.log")
            with open("/tmp/soak_server.log", "rb") as f:
                if b"Server is running" in f.read():
                    break
            time.sleep(3)
        else:
            raise RuntimeError("server never came up")
        print("server up", flush=True)

        errors: list[str] = []
        counts = {"queries": 0, "wordlists": 0, "refreshes": 0}
        stop = threading.Event()
        terms = ["algorithm", "quantum", "matrix", "galaxy poetry",
                 '"document gradient"', "database theater", "nonexistentzz",
                 "music novel physics", '"quantum poetry"']

        def qworker(i: int) -> None:
            r = _r.Random(i)
            while not stop.is_set():
                q = r.choice(terms)
                try:
                    req = urllib.request.Request(
                        f"http://127.0.0.1:{PORT}/query",
                        data=json.dumps({"query": q}).encode(),
                        headers={"Content-Type": "application/json"},
                    )
                    with urllib.request.urlopen(req, timeout=300) as resp:
                        json.load(resp)
                    counts["queries"] += 1
                except Exception as e:  # noqa: BLE001
                    errors.append(f"query {q!r}: {type(e).__name__}: {e}")

        def wworker() -> None:
            while not stop.is_set():
                try:
                    with urllib.request.urlopen(
                        f"http://127.0.0.1:{PORT}/wordlist/a", timeout=300
                    ) as resp:
                        json.load(resp)
                    counts["wordlists"] += 1
                except Exception as e:  # noqa: BLE001
                    errors.append(f"wordlist: {type(e).__name__}: {e}")
                stop.wait(2.0)

        threads = [threading.Thread(target=qworker, args=(i,)) for i in range(12)]
        threads.append(threading.Thread(target=wworker))
        for t in threads:
            t.start()

        t_end = time.monotonic() + seconds
        base = 1000
        while time.monotonic() < t_end:
            code = APPEND_SNIPPET.format(repo=repo, root=ROOT, seed=base, base=base)
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=600, cwd=repo,
            )
            if out.returncode != 0:
                errors.append("append failed: " + out.stderr[-500:])
                break
            base += 10
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{PORT}/refresh", data=b"{}",
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=900) as resp:
                    r = json.load(resp)
                    assert r.get("ok"), r
                counts["refreshes"] += 1
                print(f"refresh #{counts['refreshes']}: docs={r['docs']} "
                      f"lock={r['lock_seconds']}s queries={counts['queries']}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                errors.append(f"refresh: {type(e).__name__}: {e}")

        stop.set()
        for t in threads:
            t.join(timeout=320)
        print(json.dumps({"counts": counts, "errors": errors[:10],
                          "n_errors": len(errors)}), flush=True)
        if errors:
            sys.exit(1)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except Exception:  # noqa: BLE001
            proc.kill()


if __name__ == "__main__":
    main()
