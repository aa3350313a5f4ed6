"""Simulation tool smoke test: generated data triggers simulated mode,
runs end-to-end, and detects engineered repeats."""

from __future__ import annotations

import os

from raft_tpu.params import AlgoParams
from raft_tpu.pipeline import run_pipeline
from raft_tpu.tools.simulate import write_simulation


def test_simulate_end_to_end(tmp_path):
    out = str(tmp_path / "sim")
    info = write_simulation(out, genome_size=200_000, coverage=12.0,
                            n_repeat_fams=1, repeat_len=20000, copies=3,
                            seed=3)
    assert info["n_reads"] > 10
    assert os.path.getsize(out + ".truth_repeats.bed") > 0

    params = AlgoParams(est_cov=max(info["est_cov"], 1), cov_mul=1.5,
                        repeat_length=5000, interval_length=5000,
                        read_length=10000,
                        outputfilename=str(tmp_path / "res"))
    stats = run_pipeline(out + ".reads.fasta", out + ".overlaps.paf",
                         params, engine="jax", verbose=False)
    assert stats.n_fragments >= stats.n_reads
    # simulated mode detected → bed written with genome coordinates
    bed = (tmp_path / "res.long_repeats.bed").read_text()
    assert stats.total_repeat_length > 0
    assert bed.count("\n") > 0
