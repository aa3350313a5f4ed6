"""Streaming (chunked) pipeline: outputs must be byte-identical to the
whole-file run for any chunk size, in real and simulated modes."""

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


@pytest.mark.parametrize("chunk", [1, 7, 29, 1000])
@pytest.mark.parametrize("simulated", [False, True])
def test_chunked_equals_whole(tmp_path, chunk, simulated):
    tmp = str(tmp_path)
    reads, paf = datagen.standard_case(seed=888, tmpdir=tmp, n_reads=29,
                                       simulated=simulated)
    run_pipeline(reads, paf, _params(tmp, "whole"), engine="jax",
                 verbose=False)
    st = run_pipeline(reads, paf, _params(tmp, "chunked"), engine="jax",
                      verbose=False, chunk_reads=chunk)
    assert st.n_reads == 29
    for ext in OUTS:
        a = (tmp_path / f"whole{ext}").read_bytes()
        b = (tmp_path / f"chunked{ext}").read_bytes()
        assert a == b, f"{ext} differs at chunk={chunk}"


def test_chunked_falls_back_on_gz(tmp_path):
    tmp = str(tmp_path)
    reads, paf = datagen.standard_case(seed=889, tmpdir=tmp, n_reads=8,
                                       gz=True)
    st = run_pipeline(reads, paf, _params(tmp, "gzfall"), engine="jax",
                      verbose=False, chunk_reads=4)
    assert st.n_reads == 8
    assert (tmp_path / "gzfall.reads.fasta").exists()
