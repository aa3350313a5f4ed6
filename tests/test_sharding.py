"""Multi-device tests on the 8-virtual-CPU-device mesh: the shard_map
pipeline must equal the single-device engine (and hence the reference)."""

from __future__ import annotations

import numpy as np

import jax

import datagen
from raft_tpu.io.fasta import load_reads
from raft_tpu.io.paf import load_paf
from raft_tpu.engine_jax import compute_jax
from raft_tpu.params import AlgoParams
from raft_tpu.parallel.mesh import make_mesh


def _params():
    return AlgoParams(est_cov=10, cov_mul=1.3, repeat_length=2000,
                      interval_length=2000, read_length=4000,
                      flanking_length=300, overlap_length=200)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single(tmp_path):
    reads_path, paf_path = datagen.standard_case(
        seed=99, tmpdir=str(tmp_path), n_reads=60)
    store = load_reads(reads_path)
    table = load_paf(paf_path, store)
    params = _params().replace(real_reads=store.real_reads,
                               symmetric_overlaps=table.symmetric)

    cov1, rep1, fr1, st1 = compute_jax(store, table, params)
    mesh = make_mesh(8)
    cov8, rep8, fr8, st8 = compute_jax(store, table, params, mesh=mesh)

    assert st1.total_coverage == st8.total_coverage
    assert st1.total_windows == st8.total_windows
    assert st1.total_repeat_length == st8.total_repeat_length
    for i in range(store.n_reads):
        np.testing.assert_array_equal(cov1[i], cov8[i])
        assert rep1[i] == rep8[i]
        assert fr1[i] == fr8[i]


def test_sharded_matches_single_smaller_mesh(tmp_path):
    reads_path, paf_path = datagen.standard_case(
        seed=123, tmpdir=str(tmp_path), n_reads=10, symmetric=True)
    store = load_reads(reads_path)
    table = load_paf(paf_path, store)
    params = _params().replace(real_reads=store.real_reads,
                               symmetric_overlaps=table.symmetric)
    cov1, rep1, fr1, st1 = compute_jax(store, table, params)
    mesh = make_mesh(4)
    cov4, rep4, fr4, st4 = compute_jax(store, table, params, mesh=mesh)
    assert st1.total_repeat_length == st4.total_repeat_length
    for i in range(store.n_reads):
        np.testing.assert_array_equal(cov1[i], cov4[i])
        assert fr1[i] == fr4[i]
