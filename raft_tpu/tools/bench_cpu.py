"""CPU-backend ablation: the IDENTICAL pipeline on the host CPU jax
backend (VERDICT r2 item 2 — the "TPU-native" claim needs the
TPU-vs-own-CPU number published every round, not just TPU-vs-reference).

Run as a SUBPROCESS of bench.py so the parent's TPU client stays
untouched: forcing the platform to "cpu" before first device use is the
only way to bypass the axon plugin's platform override, and it must
happen in a fresh process. Prints ONE line: min wall seconds over N runs
(after one warm-up that absorbs CPU-backend jit compiles).

Usage: python -m raft_tpu.tools.bench_cpu reads.fa ovl.paf outprefix [N]
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    import jax
    jax.config.update("jax_platforms", "cpu")
    import time
    from raft_tpu.params import AlgoParams
    from raft_tpu.pipeline import run_pipeline

    reads, paf, out = argv[0], argv[1], argv[2]
    rounds = int(argv[3]) if len(argv) > 3 else 2
    params = AlgoParams(est_cov=20, outputfilename=out)
    run_pipeline(reads, paf, params, engine="jax", verbose=False)  # warm-up
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        run_pipeline(reads, paf, params, engine="jax", verbose=False)
        best = min(best, time.perf_counter() - t0)
    print(f"{best:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
