"""Parallel zero-copy emitters (CountWriter pre-pass + disjoint pwritev
ranges): sharded output must be byte-identical to the serial render for
every output file, in whole-file and append (chunked) modes.

The auto shard default is core-count-derived (1 on small machines), so
these tests force the parallel path with an explicit RAFT_EMIT_SHARDS —
the explicit override engages PWriter even below the auto item-count
threshold."""

from __future__ import annotations

import pytest

import datagen
from raft_tpu.params import AlgoParams
from raft_tpu.pipeline import run_pipeline

OUTS = [".reads.fasta", ".coverage.txt", ".long_repeats.txt",
        ".long_repeats.bed"]


def _params(tmp, name):
    return AlgoParams(est_cov=10, cov_mul=1.3, repeat_length=2000,
                      interval_length=2000, read_length=4000,
                      flanking_length=300, overlap_length=200,
                      outputfilename=f"{tmp}/{name}")


@pytest.mark.parametrize("shards", [2, 3, 7])
@pytest.mark.parametrize("simulated", [False, True])
def test_sharded_emit_byte_identical(tmp_path, monkeypatch, shards,
                                     simulated):
    tmp = str(tmp_path)
    reads, paf = datagen.standard_case(seed=321, tmpdir=tmp, n_reads=31,
                                       simulated=simulated)
    monkeypatch.setenv("RAFT_EMIT_SHARDS", "1")
    run_pipeline(reads, paf, _params(tmp, "serial"), engine="jax",
                 verbose=False)
    monkeypatch.setenv("RAFT_EMIT_SHARDS", str(shards))
    run_pipeline(reads, paf, _params(tmp, "sharded"), engine="jax",
                 verbose=False)
    for ext in OUTS:
        a = (tmp_path / f"serial{ext}").read_bytes()
        b = (tmp_path / f"sharded{ext}").read_bytes()
        assert a == b, f"{ext} differs at shards={shards}"


@pytest.mark.parametrize("shards", [2, 5])
def test_sharded_emit_append_mode(tmp_path, monkeypatch, shards):
    """Chunked streaming appends each chunk; the pwritev path must base
    its ranges at the current file size (no O_APPEND: Linux pwrite
    ignores offsets on O_APPEND fds)."""
    tmp = str(tmp_path)
    reads, paf = datagen.standard_case(seed=322, tmpdir=tmp, n_reads=31,
                                       simulated=True)
    monkeypatch.setenv("RAFT_EMIT_SHARDS", "1")
    run_pipeline(reads, paf, _params(tmp, "whole"), engine="jax",
                 verbose=False)
    monkeypatch.setenv("RAFT_EMIT_SHARDS", str(shards))
    run_pipeline(reads, paf, _params(tmp, "chunked"), engine="jax",
                 verbose=False, chunk_reads=9)
    for ext in OUTS:
        a = (tmp_path / f"whole{ext}").read_bytes()
        b = (tmp_path / f"chunked{ext}").read_bytes()
        assert a == b, f"{ext} differs at shards={shards} (append mode)"
