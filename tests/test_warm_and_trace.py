"""Unit tests for the round-4 instrumentation/warm machinery:

* ``engine_jax._record_shape_families`` / ``warm_shapes_async`` — the
  persisted shape-family format, LRU merge/capping, and the off-TPU
  no-op contract;
* ``RAFT_CHUNK_TRACE`` — the per-chunk JSONL schema that
  ``tools/bench_chunk.py`` consumes (guards the producer/consumer
  contract so the decomposition tool cannot silently rot).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest


def test_record_shape_families_roundtrip(tmp_path, monkeypatch):
    from raft_tpu import engine_jax as ej

    path = str(tmp_path / "warm.json")
    monkeypatch.setattr(ej, "_SHAPE_WARM_PATH", path)
    cfg = ej.StaticCfg(B=8, W=64, E=16, M=4, K=3, F=3, reso=50,
                       high_cov=10, repeat_length=100, flank=10,
                       interval_length=100, div=2, overlap_length=5)
    key_args = (((8,), "int32"), ((9,), "int64"), ((16,), "uint16"))
    ej._record_shape_families([(cfg, key_args)])
    data = json.load(open(path))
    assert len(data) == 1
    assert data[0]["cfg"]["B"] == 8 and data[0]["cfg"]["W"] == 64
    assert data[0]["args"] == [[[8], "int32"], [[9], "int64"],
                               [[16], "uint16"]]
    # the recorded entry must rebuild the exact StaticCfg
    assert ej.StaticCfg(**data[0]["cfg"]) == cfg

    # merge: a second record with a NEW family keeps the old one too
    cfg2 = ej.StaticCfg(**{**data[0]["cfg"], "B": 16})
    ej._record_shape_families([(cfg2, key_args)])
    data = json.load(open(path))
    assert len(data) == 2
    assert data[0]["cfg"]["B"] == 16  # newest first
    # re-recording an existing family does not duplicate it
    ej._record_shape_families([(cfg2, key_args)])
    assert len(json.load(open(path))) == 2


def test_record_shape_families_cap(tmp_path, monkeypatch):
    from raft_tpu import engine_jax as ej

    path = str(tmp_path / "warm.json")
    monkeypatch.setattr(ej, "_SHAPE_WARM_PATH", path)
    base = dict(W=64, E=16, M=4, K=3, F=3, reso=50, high_cov=10,
                repeat_length=100, flank=10, interval_length=100, div=2,
                overlap_length=5)
    for b in range(ej._SHAPE_WARM_MAX + 20):
        ej._record_shape_families(
            [(ej.StaticCfg(B=b + 1, **base), (((1,), "int32"),))])
    data = json.load(open(path))
    assert len(data) <= ej._SHAPE_WARM_MAX
    assert data[0]["cfg"]["B"] == ej._SHAPE_WARM_MAX + 20  # newest kept


def test_warm_async_noop_off_tpu(tmp_path, monkeypatch):
    """On the CPU backend (the test environment) the warm must be a
    no-op regardless of cache contents, and RAFT_SHAPE_WARM=0 must
    disable it everywhere."""
    from raft_tpu import engine_jax as ej

    path = str(tmp_path / "warm.json")
    monkeypatch.setattr(ej, "_SHAPE_WARM_PATH", path)
    json.dump([{"cfg": {}, "args": []}], open(path, "w"))
    assert ej.warm_shapes_async() is None  # cpu backend
    monkeypatch.setenv("RAFT_SHAPE_WARM", "0")
    assert ej.warm_shapes_async() is None


def test_chunk_trace_schema(tmp_path, monkeypatch):
    """A chunked run with RAFT_CHUNK_TRACE must emit one record per
    chunk plus a summary line, with the fields bench_chunk.analyze
    consumes — and the traced run's outputs must equal an untraced one."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import datagen
    from raft_tpu import cli

    reads, paf = datagen.standard_case(seed=5, tmpdir=str(tmp_path),
                                       n_reads=23)
    args = ["-e", "10", "-m", "1.3", "-p", "2000", "-l", "4000",
            "-f", "300", "-v", "200"]
    trace = str(tmp_path / "trace.jsonl")
    monkeypatch.setenv("RAFT_CHUNK_TRACE", trace)
    assert cli.main(args + ["-o", str(tmp_path / "tr"),
                            "--chunk-reads", "7", reads, paf]) == 0
    monkeypatch.delenv("RAFT_CHUNK_TRACE")
    assert cli.main(args + ["-o", str(tmp_path / "un"),
                            "--chunk-reads", "7", reads, paf]) == 0
    for ext in (".reads.fasta", ".coverage.txt", ".long_repeats.txt",
                ".long_repeats.bed"):
        a = open(str(tmp_path / "tr") + ext, "rb").read()
        b = open(str(tmp_path / "un") + ext, "rb").read()
        assert a == b, ext

    recs = [json.loads(line) for line in open(trace)]
    tail = recs.pop()
    assert tail["n_chunks"] == len(recs) == 4  # ceil(23/7)
    assert tail["chunk_reads"] == 7
    assert "total_wall_s" in tail and "stage_seconds" in tail
    for r in recs:
        for k in ("ci", "lo", "hi", "wait_load_s", "drain_s",
                  "compute_s", "compute_span", "engine", "n_events",
                  "load_read_s", "load_events_s", "load_span",
                  "emit_fasta_s", "emit_lr_s", "emit_bed_s"):
            assert k in r, (k, r)
        assert set(r["engine"]) >= {"bucket_prep", "fetch"}

    # the analyzer must accept the producer's output
    from raft_tpu.tools.bench_chunk import analyze
    stats = {"stage_seconds": tail["stage_seconds"], "peak_rss_mb": 1,
             "n_fragments": 0}
    out = analyze(trace, wall=1.0, stats=stats)
    assert out["n_chunks"] == 4
    assert "engine_substages_s" in out["main_thread"]
