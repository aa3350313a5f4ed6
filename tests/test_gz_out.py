"""BGZF-compressed output (--gz-out): decompressed bytes must equal the
plain outputs byte-for-byte, and the files must be valid BGZF (bgzip
block structure + EOF marker) so htslib tools and our own parallel
BGZF reader can consume them."""

from __future__ import annotations

import gzip
import os

import pytest

import datagen

EXTS = ["reads.fasta", "coverage.txt", "long_repeats.txt",
        "long_repeats.bed"]


def _run(args, cwd):
    from raft_tpu import cli
    old = os.getcwd()
    os.chdir(cwd)
    try:
        return cli.main(args)
    except SystemExit as e:  # pragma: no cover
        return e.code
    finally:
        os.chdir(old)


def _gz_assert_match(tmp_path, plain_prefix, gz_prefix):
    for ext in EXTS:
        plain = (tmp_path / f"{plain_prefix}.{ext}").read_bytes()
        gz_path = tmp_path / f"{gz_prefix}.{ext}.gz"
        assert gz_path.exists(), f"missing {gz_path}"
        assert gzip.decompress(gz_path.read_bytes()) == plain, ext


def _assert_bgzf(path):
    data = path.read_bytes()
    # gzip magic + FEXTRA with the BC subfield on the first member
    assert data[:4] == b"\x1f\x8b\x08\x04"
    xlen = data[10] | (data[11] << 8)
    extra = data[12:12 + xlen]
    assert b"BC\x02\x00" in extra
    # 28-byte BGZF EOF marker terminates the file
    assert data[-28:-24] == b"\x1f\x8b\x08\x04"
    assert data[-4:] == b"\x00\x00\x00\x00"


@pytest.mark.parametrize("simulated", [False, True])
def test_gz_out_matches_plain(tmp_path, simulated):
    reads, paf = datagen.standard_case(
        seed=404, tmpdir=str(tmp_path), n_reads=300, len_lo=2000,
        len_hi=20000, n_pairs=1500, simulated=simulated)
    base = ["-e", "10", "-p", "2000", "-l", "4000", "-f", "300",
            "-v", "200"]
    assert _run(base + ["-o", str(tmp_path / "p"), reads, paf],
                str(tmp_path)) == 0
    assert _run(base + ["-o", str(tmp_path / "g"), "--gz-out", reads, paf],
                str(tmp_path)) == 0
    _gz_assert_match(tmp_path, "p", "g")
    for ext in EXTS[:-1]:  # bed is python-written (gzip member), others BGZF
        _assert_bgzf(tmp_path / f"g.{ext}.gz")


def test_gz_out_streaming_chunks(tmp_path):
    """Chunked appends concatenate BGZF members; decompressed bytes must
    still equal the whole-file plain output."""
    reads, paf = datagen.standard_case(
        seed=405, tmpdir=str(tmp_path), n_reads=40, len_lo=1000,
        len_hi=9000, n_pairs=200)
    base = ["-e", "10", "-p", "2000", "-l", "4000"]
    assert _run(base + ["-o", str(tmp_path / "p"), reads, paf],
                str(tmp_path)) == 0
    assert _run(base + ["-o", str(tmp_path / "g"), "--gz-out",
                        "--chunk-reads", "13", reads, paf],
                str(tmp_path)) == 0
    _gz_assert_match(tmp_path, "p", "g")


def test_gz_out_python_fallback(tmp_path):
    """--pure-python-io writes plain gzip members via the gzip module;
    decompressed parity must hold there too."""
    reads, paf = datagen.standard_case(
        seed=406, tmpdir=str(tmp_path), n_reads=20, len_lo=1000,
        len_hi=6000, n_pairs=80)
    base = ["-e", "10", "-p", "2000", "-l", "4000"]
    assert _run(base + ["-o", str(tmp_path / "p"), reads, paf],
                str(tmp_path)) == 0
    assert _run(base + ["-o", str(tmp_path / "g"), "--gz-out",
                        "--pure-python-io", reads, paf],
                str(tmp_path)) == 0
    _gz_assert_match(tmp_path, "p", "g")


def test_gz_reads_roundtrip_through_native_reader(tmp_path):
    """The emitted .reads.fasta.gz must be loadable by our own parallel
    BGZF reader (write side and read side agree on the format)."""
    reads, paf = datagen.standard_case(
        seed=407, tmpdir=str(tmp_path), n_reads=60, len_lo=1000,
        len_hi=9000, n_pairs=200)
    base = ["-e", "10", "-p", "2000", "-l", "4000"]
    assert _run(base + ["-o", str(tmp_path / "g"), "--gz-out", reads, paf],
                str(tmp_path)) == 0
    from raft_tpu.io.fasta import load_reads
    store = load_reads(str(tmp_path / "g.reads.fasta.gz"))
    with gzip.open(tmp_path / "g.reads.fasta.gz", "rt") as f:
        n_hdr = sum(1 for line in f if line.startswith(">"))
    assert store.n_reads == n_hdr > 0
