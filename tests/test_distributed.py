"""Multi-host output logic, simulated in-process: slicing the store and
table per "host", computing each slice independently, emitting shards with
global numbering offsets, and concatenating must reproduce the single-host
output byte-for-byte."""

from __future__ import annotations

import numpy as np
import pytest

import datagen
from raft_tpu.engine_jax import compute_jax
from raft_tpu.io.fasta import load_reads
from raft_tpu.io.paf import load_paf
from raft_tpu.params import AlgoParams
from raft_tpu.pipeline import run_pipeline
from raft_tpu.parallel import distributed as dist


def test_shard_ranges():
    assert dist.shard_ranges(10, 3) == [(0, 4), (4, 7), (7, 10)]
    assert dist.shard_ranges(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]
    assert dist.fragment_offsets([5, 3, 2]) == [0, 5, 8]


def test_bin_ranges():
    """bin_ranges must tile [0, n) contiguously and align with the native
    PAF binner's floor(id/chunk) bins (range h == bin h)."""
    for n, H in [(10, 3), (2, 4), (24, 2), (0, 2), (7, 7), (100, 1)]:
        chunk, ranges = dist.bin_ranges(n, H)
        assert len(ranges) == H
        lo_prev = 0
        for h, (lo, hi) in enumerate(ranges):
            assert lo == lo_prev and lo <= hi
            for rid in range(lo, hi):
                assert rid // chunk == h
            lo_prev = hi
        assert lo_prev == n


@pytest.mark.parametrize("n_hosts", [2, 3])
@pytest.mark.parametrize("simulated", [False, True])
def test_sharded_emit_equals_single(tmp_path, n_hosts, simulated):
    tmp = str(tmp_path)
    reads_path, paf_path = datagen.standard_case(
        seed=2024 + n_hosts, tmpdir=tmp, n_reads=30, simulated=simulated)
    params = AlgoParams(est_cov=10, cov_mul=1.3, repeat_length=2000,
                        interval_length=2000, read_length=4000,
                        flanking_length=300, overlap_length=200,
                        outputfilename=f"{tmp}/single")
    # single-host ground truth
    run_pipeline(reads_path, paf_path, params, engine="jax", verbose=False)

    # simulated multi-host
    store = load_reads(reads_path)
    table = load_paf(paf_path, store)
    params2 = params.replace(real_reads=store.real_reads,
                             symmetric_overlaps=table.symmetric,
                             outputfilename=f"{tmp}/multi")
    ranges = dist.shard_ranges(store.n_reads, n_hosts)
    results = []
    for (lo, hi) in ranges:
        sub_store = dist._slice_store(store, lo, hi)
        sub_table = dist._slice_table(table, lo, hi)
        res = compute_jax(sub_store, sub_table, params2, strict=False)
        results.append((lo, sub_store, res))
    offsets = dist.fragment_offsets([r.n_frags for _, _, r in results])
    for h, (lo, sub_store, res) in enumerate(results):
        dist.emit_host_shard(f"{tmp}/multi", sub_store, params2, res,
                             host=h, n_hosts=n_hosts,
                             first_read_num=offsets[h] + 1,
                             first_read_index=lo)
    for ext in (".reads.fasta", ".coverage.txt", ".long_repeats.txt",
                ".long_repeats.bed"):
        dist.concat_shards(f"{tmp}/multi", ext, n_hosts)
        with open(f"{tmp}/single{ext}", "rb") as f:
            want = f.read()
        with open(f"{tmp}/multi{ext}", "rb") as f:
            got = f.read()
        assert got == want, f"{ext} differs under {n_hosts}-host sharding"
