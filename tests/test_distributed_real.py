"""REAL multi-process jax.distributed runs (CPU backend): the
concatenated shard outputs must equal a single-host run byte-for-byte.

Cases: H=2 (real + simulated headers) and H=4 on 9 reads — uneven
contiguous ranges (3/3/3/0) including an EMPTY last shard, exercising the
empty-store emit path end-to-end. Marked slow (spawns subprocesses)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

import datagen
from raft_tpu.params import AlgoParams
from raft_tpu.pipeline import run_pipeline

OUTS = [".reads.fasta", ".coverage.txt", ".long_repeats.txt",
        ".long_repeats.bed"]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_and_compare(tmp_path, reads, paf, n_proc):
    tmp = str(tmp_path)
    params = AlgoParams(est_cov=10, cov_mul=1.3, repeat_length=2000,
                        interval_length=2000, read_length=4000,
                        flanking_length=300, overlap_length=200,
                        outputfilename=f"{tmp}/single")
    run_pipeline(reads, paf, params, engine="jax", verbose=False)

    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(n_proc), str(pid),
             reads, paf, f"{tmp}/multi"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(n_proc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    for ext in OUTS:
        a = (tmp_path / f"single{ext}").read_bytes()
        b = (tmp_path / f"multi{ext}").read_bytes()
        assert a == b, f"{ext} differs under real {n_proc}-process run"


@pytest.mark.slow
@pytest.mark.parametrize("simulated", [False, True])
def test_two_process_distributed(tmp_path, simulated):
    reads, paf = datagen.standard_case(seed=777, tmpdir=str(tmp_path),
                                       n_reads=24, simulated=simulated)
    _run_and_compare(tmp_path, reads, paf, n_proc=2)


@pytest.mark.slow
def test_four_process_uneven_empty_shard(tmp_path):
    # 9 reads, H=4: bin_ranges chunk=3 → (0,3),(3,6),(6,9),(9,9) — the
    # last host owns ZERO reads and must still emit valid empty shards
    # and participate in the fragment-offset allgather.
    reads, paf = datagen.standard_case(seed=4242, tmpdir=str(tmp_path),
                                       n_reads=9)
    _run_and_compare(tmp_path, reads, paf, n_proc=4)
