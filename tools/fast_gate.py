"""Parallel fast gate (VERDICT r12 ask #4): shard the non-fuzz,
non-soak test files across N pytest subprocesses.

pytest-xdist is not installed in this container (and installing is
out of scope), so this shards at FILE granularity: each worker is a
plain `pytest <files> -m "not fuzz and not soak"` subprocess with its
own SparkSession JVM. Isolation notes:

- Each worker runs in its own TEMP working directory, so the
  cwd-relative side-effect paths (`spark-warehouse/`, `derby.log`,
  `metastore_db/`) never collide across workers. Tests already
  address the repo and fixtures by absolute path (tests/conftest.py
  inserts the repo root from __file__).
- Spark driver ports auto-assign per JVM; the UI is disabled by
  build_spark, so there is no port race.
- Shards are balanced greedily by file size (largest first onto the
  least-loaded shard) — a cheap proxy for runtime that keeps the
  heaviest files (stateful, gateway, connectors) on separate workers.

Usage:
    python tools/fast_gate.py [N_WORKERS] [extra pytest args...]

Exit code: 0 iff every worker's pytest exits 0. Per-worker output is
streamed to /tmp/fast_gate_worker<i>.log and each tail is echoed on
completion.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TESTS = REPO / "tests"


def shard_files(n: int) -> list[list[Path]]:
    files = sorted(TESTS.glob("test_*.py"))
    shards: list[tuple[int, list[Path]]] = [(0, []) for _ in range(n)]
    for f in sorted(files, key=lambda p: p.stat().st_size, reverse=True):
        size, members = min(shards, key=lambda s: s[0])
        members.append(f)
        shards[shards.index((size, members))] = (size + f.stat().st_size, members)
    return [members for _, members in shards if members]


def main() -> int:
    args = sys.argv[1:]
    n = int(args.pop(0)) if args and args[0].isdigit() else 4
    shards = shard_files(n)
    procs = []
    t0 = time.time()
    for i, files in enumerate(shards):
        wdir = tempfile.mkdtemp(prefix=f"fastgate-{i}-")
        log = open(f"/tmp/fast_gate_worker{i}.log", "w")
        cmd = [
            sys.executable, "-m", "pytest",
            *[str(f) for f in files],
            "-q", "-m", "not fuzz and not soak",
            "-p", "no:cacheprovider",
            *args,
        ]
        env = dict(os.environ)
        # Spark's executor-side Python workers resolve module-referenced
        # functions (applyInPandas kernels etc.) through PYTHONPATH, not
        # the driver's sys.path — with the subprocess cwd moved to the
        # isolation tmpdir the repo package vanishes from the workers
        # unless it is pip-installed. Export it explicitly so the gate
        # is green on a bare checkout too.
        env["PYTHONPATH"] = str(REPO) + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        # keep pytest's rootdir/ini discovery on the repo even though
        # the subprocess cwd is the isolation tmpdir
        cmd[3:3] = ["-c", str(REPO / "pyproject.toml"), "--rootdir", str(REPO)]
        procs.append(
            (i, subprocess.Popen(cmd, cwd=wdir, stdout=log, stderr=subprocess.STDOUT, env=env), log)
        )
        print(f"worker {i}: {len(files)} files -> /tmp/fast_gate_worker{i}.log")
    rc = 0
    for i, p, log in procs:
        code = p.wait()
        log.close()
        tail = Path(f"/tmp/fast_gate_worker{i}.log").read_text().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"worker {i}: exit {code} — {summary}")
        # exit 5 = no tests collected (a shard of fuzz/soak-only files
        # after the -m filter) — not a failure
        if code not in (0, 5):
            rc = 1
    print(f"fast gate: {'GREEN' if rc == 0 else 'RED'} in {time.time()-t0:.0f}s")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
