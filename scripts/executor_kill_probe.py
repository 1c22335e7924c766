"""Executor-failure resilience probe (CLAUDE.md candidate; north rule
resumability evidence).

Runs the flagship mosaic job on local-cluster[2,4,4096] — two SEPARATE
executor JVMs — and SIGKILLs one executor mid-run. Spark standalone
relaunches the executor and retries its tasks (plus regenerates any
shuffle blocks lost with the JVM), so the job must complete with a
table byte-identical to an uninterrupted local[8] reference run.

Usage: python scripts/executor_kill_probe.py
Prints one JSON verdict line; exit 0 on success.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BOUNDS = "499000,4095000,560000,4156000"
N = 12000


def submit(master: str, out: str, extra: list[str] | None = None):
    cmd = [
        "spark-submit", "--master", master, "--driver-memory", "8g",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--py-files", os.path.join(ROOT, "dist/engine.zip"),
        os.path.join(ROOT, "jobs/mosaic_job.py"),
        "--generate", str(N), "--bounds", BOUNDS, "--output", out,
    ] + (extra or [])
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)


def executor_pids() -> list[int]:
    out = subprocess.run(["pgrep", "-f", "CoarseGrainedExecutorBackend"],
                         capture_output=True, text=True).stdout
    return [int(p) for p in out.split()]


def chunk_md5s(out: str) -> dict:
    import duckdb
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT time_idx, row_idx, col_idx, md5(chunk::VARCHAR) AS m FROM "
        f"read_parquet('{out}/data/*/*/*.parquet', "
        f"hive_partitioning=true)").fetchall()
    return {(r[0], r[1], r[2]): r[3] for r in rows}


def main() -> int:
    ref_out, kill_out = "/tmp/ek_ref", "/tmp/ek_kill"
    for d in (ref_out, kill_out):
        shutil.rmtree(d, ignore_errors=True)

    p = submit("local[8]", ref_out)
    p.wait()

    p = submit("local-cluster[2,4,4096]", kill_out)
    killed_pid = None
    t0 = time.time()
    while p.poll() is None and time.time() - t0 < 600:
        pids = executor_pids()
        # kill one executor once BOTH are up and the job has had time
        # to start real work on them
        if killed_pid is None and len(pids) >= 2 and time.time() - t0 > 25:
            killed_pid = pids[0]
            os.kill(killed_pid, 9)
        time.sleep(1)
    stdout = p.stdout.read() if p.stdout else ""
    rc = p.wait()

    ref = chunk_md5s(ref_out)
    got = chunk_md5s(kill_out) if rc == 0 else {}
    ok = rc == 0 and killed_pid is not None and got == ref and len(ref) > 0
    print(json.dumps({
        "killed_executor_pid": killed_pid,
        "job_exit": rc,
        "ref_chunks": len(ref),
        "post_kill_chunks": len(got),
        "byte_identical": got == ref,
        "ok": ok,
        "metrics_line": stdout.strip().splitlines()[-1] if stdout else None,
    }))
    for d in (ref_out, kill_out):
        shutil.rmtree(d, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
