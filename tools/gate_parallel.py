#!/usr/bin/env python3
"""Chunked-parallel front end for check_oracle.py (dev tool).

The sf~1 full-inventory gate runs ~450 DuckDB oracles over a ~10x store;
serially that is hours. This wrapper splits the oracle key list into N
chunks and runs N check_oracle.py processes, each capped via
DUCKDB_THREADS and DUCKDB_MEMORY so the box is shared instead of
oversubscribed (8 uncapped processes inside the dedup-family oracles
measured ~18 GB RSS each — OOM territory on a 128 GB box).

Keys already marked PASS in existing gate_chunk_*.log files are skipped
(resume after an interrupted run); delete the logs for a from-scratch
gate. Chunks are striped AFTER resume filtering, so the heavy families
(alphabetically adjacent) spread across waves rather than landing on
every process at once.

Usage: python3 tools/gate_parallel.py <sfDir> <outDir> [nproc=4]
       [threads=8] [memory=20GB]
Exit code 0 iff no chunk reports FAIL/WARN.
"""
import glob, json, os, subprocess, sys


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    nproc = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    threads = sys.argv[4] if len(sys.argv) > 4 else "8"
    memory = sys.argv[5] if len(sys.argv) > 5 else "20GB"
    keys = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    done = set()
    for log in glob.glob(f"{out_dir}/gate_chunk_*.log"):
        for line in open(log):
            if line.startswith("PASS "):
                done.add(line.split()[1])
    todo = [k for k in keys if k not in done]
    print(f"gate: {len(keys)} oracles, {len(done)} already passed, "
          f"{len(todo)} to run on {nproc} procs "
          f"({threads} threads / {memory} each)")
    chunks = [todo[i::nproc] for i in range(nproc)]
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, DUCKDB_THREADS=str(threads),
               DUCKDB_MEMORY=memory)
    procs = []
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        log = f"{out_dir}/gate_chunk_r{i}.log"  # r-prefix: new wave
        p = subprocess.Popen(
            [sys.executable, os.path.join(here, "check_oracle.py"),
             sf_dir, out_dir, ",".join(chunk)],
            stdout=open(log, "a"), stderr=subprocess.STDOUT, env=env)
        procs.append((i, p, log))
    for i, p, log in procs:
        p.wait()
    # Tally with per-key latest-status semantics: resume reruns failed keys
    # but their old FAIL/WARN lines persist in the appended logs, so a raw
    # line scan would exit 1 even after a clean rerun. A key counts as bad
    # only if NO log anywhere records a PASS for it (resume never reruns a
    # passed key, so a PASS is always the key's final word).
    status = {}  # key -> last non-PASS line seen (for reporting)
    passed = set()
    for log in glob.glob(f"{out_dir}/gate_chunk_*.log"):
        for line in open(log):
            if line.startswith("PASS "):
                passed.add(line.split()[1])
            elif line.startswith(("FAIL ", "WARN ")):
                k = line.split()[1].rstrip(":")
                status[k] = line.strip()
    bad = [status[k] for k in sorted(status) if k not in passed]
    n_pass = len(passed)
    print(f"== parallel gate: {n_pass} pass, {len(bad)} fail/warn ==")
    for line in bad[:40]:
        print(line)
    sys.exit(0 if not bad else 1)


if __name__ == "__main__":
    main()
