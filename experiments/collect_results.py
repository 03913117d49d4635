"""Round-5 RESULTS assembler: run the full bench ladder stage-by-stage as
subprocess `--mode` invocations (each prints one JSON line) and write
RESULTS_rNN.json with the same header emit_results uses. Exists because the
round-5 ladder grew three >15-min stages (serve1m_routes, parity2m, the
mesh projection) — running them through one long-lived process risks a
single failure eating the whole artifact, and stage-level re-runs (the
FINDINGS >25%-deviation rule) need per-stage entry points anyway.

python experiments/collect_results.py RESULTS_r05.json [--only stage1,stage2]
[--splice file.json]   # pre-measured entries to merge (e.g. scale2m run
                       # earlier tonight at the same HEAD) — stages present
                       # in the splice are not re-run
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, argv-after-bench.py, timeout_s)
# ordered critical-first so a budget overrun costs the cheapest entries
STAGES = [
    ("headline", [], 900),
    ("mixed", ["--mode", "mixed"], 900),
    ("serve1m", ["--mode", "serve1m"], 4800),
    ("serve1m_stale_pure",
     ["--mode", "serve1m", "--phraseStale", "pure"], 4800),
    ("serve1m_routes", ["--mode", "serve1m", "--routeMix"], 4800),
    ("parity_tpu", ["--mode", "parity"], 1800),
    ("parity1m", ["--mode", "parity1m"], 3600),
    ("scale1m", ["--mode", "scale1m"], 900),
    ("sharded", ["--mode", "sharded"], 1200),
    ("parity2m", ["--mode", "parity2m"], 3600),
    ("sparse2m", ["--mode", "sparse2m"], 4800),
    ("serve", ["--mode", "serve"], 2400),
    ("phrase", ["--mode", "phrase"], 900),
    ("parity_rare", ["--mode", "parity_rare"], 1800),
    ("pagerank", ["--mode", "pagerank", "--cpu"], 900),
    ("index", ["--mode", "index", "--cpu"], 1800),
    ("scale2m", ["--mode", "scale2m"], 4800),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RESULTS_r05.json"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    spliced = {}
    if "--splice" in sys.argv:
        spliced = json.load(open(sys.argv[sys.argv.index("--splice") + 1]))

    import subprocess as sp

    head = sp.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                  capture_output=True, text=True).stdout.strip()
    from bench import host_calibration
    import platform

    results: dict = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))  # resumable
    results.setdefault("_meta", {})
    results["_meta"].update({
        "host": platform.node(),
        "host_calib": host_calibration(),
        "git_head": head,
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "assembler": "experiments/collect_results.py (stage subprocesses)",
    })
    for name, entry in spliced.items():
        if not name.startswith("_"):
            results[name] = entry

    for name, argv, tmo in STAGES:
        if only is not None and name not in only:
            continue
        if name in results and "error" not in results.get(name, {}):
            print(f"# {name}: kept existing entry", file=sys.stderr, flush=True)
            continue
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "bench.py"] + argv, capture_output=True,
                text=True, timeout=tmo, cwd=REPO,
            )
            if proc.returncode != 0:
                raise RuntimeError(proc.stderr[-1200:])
            results[name] = json.loads(proc.stdout.strip().splitlines()[-1])
            if argv[-1:] == ["--cpu"]:
                results[name]["backend"] = "cpu-fresh"
        except Exception as exc:  # noqa: BLE001 — record, keep going
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
        print(f"# {name}: {json.dumps(results[name])[:300]} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr, flush=True)
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main()
