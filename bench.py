#!/usr/bin/env python
"""RAFT-TPU headline benchmark.

Runs the full end-to-end pipeline (parse → device compute → emit) on a
synthetic workload matching the surveyed baseline (BASELINE.md row 3:
2000 reads / ~47 Mbp / ~100k PAF rows) scaled up, on the real TPU chip,
and compares reads/s against the reference binary run live on this
machine (falling back to the surveyed 2,600 reads/s single-thread figure
if g++ is unavailable).

Prints ONE JSON line:
  {"metric": "reads_per_s", "value": N, "unit": "reads/s", "vs_baseline": R}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BASELINE_READS_PER_S = 2600.0  # measured: reference, 1 thread, BASELINE.md
REF_DIR = "/root/reference"
WORK = "/tmp/raft_bench"
N_READS = int(os.environ.get("RAFT_BENCH_READS", "8000"))
ARGS = ["-e", "20", "-m", "1.5", "-p", "10000", "-l", "20000",
        "-f", "1000", "-v", "500"]


def build_reference() -> str | None:
    out = os.path.join(WORK, "raft_ref")
    if os.path.exists(out):
        return out
    if not shutil.which("g++") or not os.path.exists(REF_DIR):
        return None
    res = subprocess.run(
        ["g++", "-O3", "-std=c++14", "-I", REF_DIR,
         os.path.join(REF_DIR, "main.cpp"), "-lz", "-o", out],
        capture_output=True)
    return out if res.returncode == 0 else None


def time_reference(ref_bin: str, reads: str, paf: str,
                   repeats: int = 3) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = subprocess.run(
            [ref_bin] + ARGS + ["-o", os.path.join(WORK, "refout"),
                                reads, paf],
            capture_output=True, timeout=3600)
        dt = time.perf_counter() - t0
        if res.returncode != 0:
            return float("nan")
        best = min(best, dt)
    return best


def time_ours(reads: str, paf: str, engine: str = "jax",
              repeats: int = 3) -> float:
    from raft_tpu.params import AlgoParams
    from raft_tpu.pipeline import run_pipeline

    params = AlgoParams(est_cov=20, outputfilename=os.path.join(WORK, "ours"))
    # warm-up: compiles every bucket shape (persistent-cached across runs)
    run_pipeline(reads, paf, params, engine=engine, verbose=False)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        st = run_pipeline(reads, paf, params, engine=engine, verbose=False)
        best = min(best, time.perf_counter() - t0)
    print("bench stages (last run): "
          + ", ".join(f"{k}={v:.3f}s" for k, v in st.stage_seconds.items()),
          file=sys.stderr)
    return best


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    from raft_tpu.tools.benchgen import gen_dataset
    reads, paf = gen_dataset(os.path.join(WORK, f"data{N_READS}"),
                             n_reads=N_READS,
                             n_overlaps=N_READS * 30, est_cov=20)

    ref_bin = build_reference()
    ref_reads_per_s = BASELINE_READS_PER_S
    ref_dt = None
    if ref_bin:
        ref_dt = time_reference(ref_bin, reads, paf)
        if ref_dt == ref_dt:  # not NaN
            ref_reads_per_s = N_READS / ref_dt

    dt = time_ours(reads, paf)
    reads_per_s = N_READS / dt

    result = {
        "metric": "reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / ref_reads_per_s, 3),
    }
    # extra context on stderr (driver reads the stdout JSON line only)
    print(f"bench: ours {dt:.3f}s, reference "
          f"{ref_dt if ref_dt else 'surveyed'}s on {N_READS} reads "
          f"({ref_reads_per_s:.0f} ref reads/s)", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
