#!/usr/bin/env python
"""RAFT-TPU headline benchmark.

Runs the full end-to-end pipeline (parse → device compute → emit) on a
synthetic workload matching the surveyed baseline (BASELINE.md row 3
scaled up: N reads / ~23.6 kb mean / 30 PAF rows per read) on the real
TPU chip, and compares reads/s against the reference binary run live on
the same machine (falling back to the surveyed 2,600 reads/s
single-thread figure if g++ is unavailable).

Noise control: the workdir is tmpfs when available, and reference/ours
timings are INTERLEAVED over several rounds (min of each) so machine
drift hits both sides equally.

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
WORK = os.environ.get(
    "RAFT_BENCH_DIR",
    "/dev/shm/raft_bench" if os.path.isdir("/dev/shm") else "/tmp/raft_bench")
N_READS = int(os.environ.get("RAFT_BENCH_READS", "32000"))
ROUNDS = int(os.environ.get("RAFT_BENCH_ROUNDS", "6"))
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


def run_reference_once(ref_bin: str, reads: str, paf: str) -> float:
    t0 = time.perf_counter()
    res = subprocess.run(
        [ref_bin] + ARGS + ["-o", os.path.join(WORK, "refout"), reads, paf],
        capture_output=True, timeout=3600)
    dt = time.perf_counter() - t0
    return dt if res.returncode == 0 else float("nan")


_BEST = {"ours": float("inf"), "ref": float("inf")}


def _emit_json(ours_best: float, ref_reads_per_s: float) -> None:
    reads_per_s = N_READS / ours_best if ours_best > 0 else 0.0
    print(json.dumps({
        "metric": "reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / ref_reads_per_s, 3),
    }), flush=True)


def _alarm(signum, frame):
    """Hard deadline (degraded tunnel days): report the best end-to-end
    timing observed so far — the warm-up run counts, pessimistically, as
    it includes per-process program-load — so the driver always gets its
    JSON line."""
    ours = _BEST["ours"]
    ref = _BEST["ref"]
    ref_rps = (N_READS / ref) if ref == ref and ref != float("inf") \
        else BASELINE_READS_PER_S
    print(f"bench: HARD DEADLINE hit; reporting best-so-far "
          f"(ours {ours:.1f}s)", file=sys.stderr)
    _emit_json(ours if ours != float("inf") else 0.0, ref_rps)
    os._exit(0)


def main() -> None:
    import signal
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("RAFT_BENCH_HARD_S", "1200")))
    os.makedirs(WORK, exist_ok=True)
    from raft_tpu.tools.benchgen import gen_dataset
    reads, paf = gen_dataset(os.path.join(WORK, f"data{N_READS}"),
                             n_reads=N_READS,
                             n_overlaps=N_READS * 30, est_cov=20)

    from raft_tpu.params import AlgoParams
    from raft_tpu.pipeline import run_pipeline

    params = AlgoParams(est_cov=20, outputfilename=os.path.join(WORK, "ours"))
    # warm-up: compiles every bucket shape (persistent-cached across runs)
    # and absorbs the per-process executable-load cost; timed so a hard
    # deadline still has an honest (pessimistic) end-to-end number
    t0 = time.perf_counter()
    st = run_pipeline(reads, paf, params, engine="jax", verbose=False)
    _BEST["ours"] = time.perf_counter() - t0

    ref_bin = build_reference()
    ref_best = float("inf")
    ours_best = float("inf")
    budget = float(os.environ.get("RAFT_BENCH_BUDGET_S", "180"))
    t_rounds = time.perf_counter()
    for rnd in range(ROUNDS):
        if ref_bin:
            ref_best = min(ref_best, run_reference_once(ref_bin, reads, paf))
            _BEST["ref"] = ref_best
        t0 = time.perf_counter()
        st = run_pipeline(reads, paf, params, engine="jax", verbose=False)
        ours_best = min(ours_best, time.perf_counter() - t0)
        _BEST["ours"] = min(_BEST["ours"], ours_best)
        # always complete at least one round; stop when over budget so the
        # driver gets its JSON line even on a degraded TPU tunnel
        if time.perf_counter() - t_rounds > budget:
            break

    if ref_bin and ref_best == ref_best and ref_best != float("inf"):
        ref_reads_per_s = N_READS / ref_best
    else:
        ref_reads_per_s = BASELINE_READS_PER_S

    signal.alarm(0)  # single JSON line: never race the deadline handler
    # the warm-up timing counts as a (pessimistic) round
    ours_best = min(ours_best, _BEST["ours"])
    print("bench stages (last run): "
          + ", ".join(f"{k}={v:.3f}s" for k, v in st.stage_seconds.items()),
          file=sys.stderr)
    print(f"bench: ours {ours_best:.3f}s, reference {ref_best:.3f}s on "
          f"{N_READS} reads ({ref_reads_per_s:.0f} ref reads/s)",
          file=sys.stderr)
    _emit_json(ours_best, ref_reads_per_s)


if __name__ == "__main__":
    main()
