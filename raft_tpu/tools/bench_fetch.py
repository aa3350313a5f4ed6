"""Fetch-tail decomposition harness (VERDICT r2 item 2, second half).

The 32k-read bench spends ~0.4 s in "fetch" — the wall between the last
async dispatch and the last packed array landing on the host. This tool
separates that wall into its physical parts on the real chip so the
round can either shrink it or prove it is at the link floor:

* ``rpc_floor_ms``   — device_get of a 4-byte array (pure RPC latency)
* ``bw_mb_s``        — device_get of one 8 MB array (pure D2H bandwidth)
* ``exec_s``         — dispatch all buckets, block_until_ready, no D2H
* ``fetch_w{N}_s``   — D2H of all (already computed) packed outputs with
                       N concurrent workers
* ``fetch_batched_s``— ONE ``jax.device_get`` call carrying every
                       bucket's output pytree (does the client coalesce
                       RPCs?)
* ``engine_like_s``  — dispatch + concurrent fetch exactly like
                       ``engine_jax.compute`` (the number bench.py sees)
* ``d2h_bytes``      — actual packed payload (the bandwidth-floor term)

Workload identical to bench.py's 32k case (cov_out="host": the packed
[B, 2K+2F+5] int32 array is the only D2H). Run AFTER bench.py or any
TPU job finishes — one process owns the tunnel at a time.
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

    if os.environ.get("RAFT_FORCE_CPU"):
        # smoke-testing the harness off-chip (the axon plugin overrides
        # JAX_PLATFORMS; config.update before first device use is the
        # only bypass — see tools/bench_cpu.py)
        import jax
        jax.config.update("jax_platforms", "cpu")

    work = os.environ.get(
        "RAFT_BENCH_DIR",
        "/dev/shm/raft_bench" if os.path.isdir("/dev/shm") else
        "/tmp/raft_bench")
    os.makedirs(work, exist_ok=True)
    from raft_tpu.tools.benchgen import gen_dataset
    reads, paf = gen_dataset(os.path.join(work, f"data{n_reads}"),
                             n_reads=n_reads, n_overlaps=n_reads * 30,
                             est_cov=20)

    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp
    from raft_tpu import bucketing
    from raft_tpu.engine_jax import derive_cfg, device_step, pack_events
    from raft_tpu.io.fasta import load_reads
    from raft_tpu.io.paf import load_paf
    from raft_tpu.params import AlgoParams

    res = {"backend": jax.default_backend(), "n_reads": n_reads}

    # --- link microbenchmarks -------------------------------------------
    tiny = jax.device_put(jnp.zeros((1,), jnp.int32))
    jax.block_until_ready(tiny)
    t = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        t.append(time.perf_counter() - t0)
    res["rpc_floor_ms"] = round(min(t) * 1e3, 2)

    big = jax.device_put(jnp.zeros((2 << 20,), jnp.int32))  # 8 MB
    jax.block_until_ready(big)
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(big)
        t.append(time.perf_counter() - t0)
    res["bw_mb_s"] = round(8.0 / min(t), 1)

    # --- real workload buckets ------------------------------------------
    store = load_reads(reads)
    table = load_paf(paf, store)
    params = AlgoParams(est_cov=20)
    lens = store.lens.astype(np.int32)
    g = table.events_grouped(store.n_reads, lens, params.reso)
    if g is None:
        print(json.dumps({"error": "no native grouped events"}))
        return 1
    prepared = []
    d2h_bytes = 0
    for bk in bucketing.iter_buckets(lens, None, None, None, params.reso,
                                     prebinned=g):
        cfg = derive_cfg(bk.B, bk.W, bk.E, params, cov_out="host")
        args = (jnp.asarray(bk.lens), jnp.asarray(bk.ev_off),
                jnp.asarray(pack_events(bk.ev_w0, bk.ev_w1, cfg)))
        prepared.append((cfg, args))
        d2h_bytes += bk.B * (2 * cfg.K + 2 * cfg.F + 5) * 4
    res["n_buckets"] = len(prepared)
    res["d2h_bytes"] = d2h_bytes
    res["d2h_floor_s"] = round(d2h_bytes / 1e6 / res["bw_mb_s"], 3)

    # warm-up: compile + per-process program load (absorbed, not timed)
    for cfg, args in prepared:
        jax.block_until_ready(device_step(*args, cfg=cfg))

    def dispatch_all():
        return [device_step(*args, cfg=cfg) for cfg, args in prepared]

    # exec-only: results stay on device
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(dispatch_all())
        best = min(best, time.perf_counter() - t0)
    res["exec_s"] = round(best, 3)

    # fetch-only at worker counts (outs already computed on device)
    outs = dispatch_all()
    jax.block_until_ready(outs)
    for nw in (1, 2, 4, 8):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            with cf.ThreadPoolExecutor(max_workers=nw) as ex:
                list(ex.map(jax.device_get, outs))
            best = min(best, time.perf_counter() - t0)
        res[f"fetch_w{nw}_s"] = round(best, 3)

    # one batched get of everything
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(outs)
        best = min(best, time.perf_counter() - t0)
    res["fetch_batched_s"] = round(best, 3)

    # engine-like: dispatch + 4-worker concurrent fetch, end to end
    def engine_like():
        outs = dispatch_all()
        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            return list(ex.map(jax.device_get, outs))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        engine_like()
        best = min(best, time.perf_counter() - t0)
    res["engine_like_s"] = round(best, 3)

    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
