"""Pallas pileup kernel A/B on the real chip: prove it or drop it.

For every bucket shape of the headline bench workload this times the full
``device_step`` (same H2D/D2H either way) with the Pallas one-hot-matmul
pileup vs the XLA diff-scatter pileup, COMPILED on the TPU (not
interpret mode), and byte-compares the packed outputs — the
compiled-on-hardware correctness check the interpret-mode unit tests
cannot give. Run AFTER bench.py, never concurrently (one TPU process).

Timing discipline (VERDICT r3 item 3): the two sides are INTERLEAVED
(s,p,s,p,…) over ``RAFT_AB_ROUNDS`` rounds per shape so machine drift
hits both equally, and the per-round arrays + spread ship in the JSON —
a "win" only counts when it clears the measured spread of both sides.

Usage::

    python -m raft_tpu.tools.bench_pallas [n_reads]

Prints one JSON line: per-shape timings + the verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    n_reads = int(argv[0]) if argv else int(
        os.environ.get("RAFT_BENCH_READS", "32000"))

    work = os.environ.get(
        "RAFT_BENCH_DIR",
        "/dev/shm/raft_bench" if os.path.isdir("/dev/shm") else
        "/tmp/raft_bench")
    os.makedirs(work, exist_ok=True)
    from raft_tpu.tools.benchgen import gen_dataset
    reads, paf = gen_dataset(os.path.join(work, f"data{n_reads}"),
                             n_reads=n_reads, n_overlaps=n_reads * 30,
                             est_cov=20)

    import jax
    import jax.numpy as jnp
    from raft_tpu import bucketing
    from raft_tpu.engine_jax import derive_cfg, device_step, pack_events
    from raft_tpu.io.fasta import load_reads
    from raft_tpu.io.paf import load_paf
    from raft_tpu.params import AlgoParams

    backend = jax.default_backend()
    store = load_reads(reads)
    table = load_paf(paf, store)
    params = AlgoParams(est_cov=20)
    lens = store.lens.astype(np.int32)
    g = table.events_grouped(store.n_reads, lens, params.reso)
    if g is None:
        print(json.dumps({"error": "no native grouped events"}))
        return 1

    from raft_tpu.ops.pileup_pallas import EB

    rounds = int(os.environ.get("RAFT_AB_ROUNDS", "5"))

    def timed_once(cfg, args):
        t0 = time.perf_counter()
        out = device_step(*args, cfg=cfg)
        jax.block_until_ready(out)
        return time.perf_counter() - t0, out

    def interleaved_ab(cfg_s, args_s, cfg_p, args_p):
        """Warm both sides (compile + program load), then alternate
        s,p,s,p,… ``rounds`` times. Returns (times_s, times_p,
        packed_s, packed_p)."""
        _, out_s = timed_once(cfg_s, args_s)
        _, out_p = timed_once(cfg_p, args_p)
        ts, tp = [], []
        for _ in range(rounds):
            dt, out_s = timed_once(cfg_s, args_s)
            ts.append(dt)
            dt, out_p = timed_once(cfg_p, args_p)
            tp.append(dt)
        return (ts, tp, np.asarray(out_s["packed"]),
                np.asarray(out_p["packed"]))

    # each side gets the bucket layout its pipeline would really use:
    # scatter = the ladder E, pallas = E pre-quantized to the kernel's
    # event-block quantum (host-side wrapper; the read partition is
    # identical so packed outputs stay row-comparable)
    buckets_s = bucketing.iter_buckets(lens, None, None, None, params.reso,
                                       prebinned=g)
    buckets_p = bucketing.iter_buckets(lens, None, None, None, params.reso,
                                       prebinned=g, e_quantum=EB)
    results = []
    verdict_rows = []
    for bk_s, bk_p in zip(buckets_s, buckets_p):
        cfg_s = derive_cfg(bk_s.B, bk_s.W, bk_s.E, params, use_pallas=False)
        cfg_p = derive_cfg(bk_p.B, bk_p.W, bk_p.E, params, use_pallas=True)
        eligible = (bk_p.W % 128 == 0 and bk_p.B % min(128, bk_p.B) == 0
                    and bk_p.W % min(512, bk_p.W) == 0 and backend == "tpu")
        args_s = (jnp.asarray(bk_s.lens), jnp.asarray(bk_s.ev_off),
                  jnp.asarray(pack_events(bk_s.ev_w0, bk_s.ev_w1, cfg_s)))

        row = {"B": bk_s.B, "W": bk_s.W, "E": bk_s.E, "n_used": bk_s.n_used,
               "pallas_eligible": eligible}
        if eligible:
            args_p = (jnp.asarray(bk_p.lens), jnp.asarray(bk_p.ev_off),
                      jnp.asarray(pack_events(bk_p.ev_w0, bk_p.ev_w1,
                                              cfg_p)))
            ts, tp, packed_s, packed_p = interleaved_ab(
                cfg_s, args_s, cfg_p, args_p)
            s_min, p_min = min(ts), min(tp)
            # spread: relative wobble of each side's own rounds — the
            # noise bar a claimed win must clear
            s_spread = (max(ts) - s_min) / s_min if s_min else 0.0
            p_spread = (max(tp) - p_min) / p_min if p_min else 0.0
            speedup = s_min / p_min if p_min else 0.0
            row.update({
                "E_pallas": bk_p.E,
                "scatter_s": round(s_min, 4),
                "pallas_s": round(p_min, 4),
                "scatter_rounds_s": [round(t, 4) for t in ts],
                "pallas_rounds_s": [round(t, 4) for t in tp],
                "spread": round(max(s_spread, p_spread), 3),
                "pallas_speedup": round(speedup, 3),
                # win only if it clears BOTH sides' wobble
                "clears_spread": bool(
                    speedup > 1.0 + max(s_spread, p_spread)),
                "outputs_equal": bool(np.array_equal(packed_s, packed_p)),
            })
            verdict_rows.append(row)
        else:
            t_best = float("inf")
            out = device_step(*args_s, cfg=cfg_s)
            jax.block_until_ready(out)
            for _ in range(rounds):
                dt, out = timed_once(cfg_s, args_s)
                t_best = min(t_best, dt)
            row["scatter_s"] = round(t_best, 4)
        results.append(row)
        print(f"shape B={bk_s.B} W={bk_s.W} E={bk_s.E}: {row}",
              file=sys.stderr)

    all_equal = all(r.get("outputs_equal", True) for r in verdict_rows)
    wins = [r for r in verdict_rows if r.get("clears_spread")]
    print(json.dumps({
        "backend": backend,
        "rounds": rounds,
        "n_shapes": len(results),
        "pallas_eligible_shapes": len(verdict_rows),
        "pallas_outputs_equal": all_equal,
        "pallas_wins_clearing_spread": len(wins),
        "shapes": results,
    }), flush=True)
    return 0 if all_equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
