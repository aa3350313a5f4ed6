"""Byte-parity of all four output files against the compiled reference.

This is the golden harness from SURVEY.md §7 step 1: every engine must
produce byte-identical ``.reads.fasta``, ``.coverage.txt``,
``.long_repeats.txt`` and ``.long_repeats.bed`` for every input mode.
"""

from __future__ import annotations

import os
import subprocess

import pytest

import datagen

OUTS = [".reads.fasta", ".coverage.txt", ".long_repeats.txt",
        ".long_repeats.bed"]


def run_reference(ref_bin, args, cwd):
    res = subprocess.run([ref_bin] + args, cwd=cwd, capture_output=True,
                         text=True, timeout=300)
    assert res.returncode == 0, f"reference failed: {res.stdout}\n{res.stderr}"
    return res.stdout


def run_ours(args, engine="oracle", io="python"):
    from raft_tpu import cli
    extra = ["--pure-python-io"] if io == "python" else []
    rc = cli.main(args + ["--engine", engine] + extra)
    assert rc == 0


def assert_parity(tmp, ref_prefix, our_prefix):
    for ext in OUTS:
        ref_f = ref_prefix + ext
        our_f = our_prefix + ext
        assert os.path.exists(our_f), f"missing {our_f}"
        with open(ref_f, "rb") as f:
            ref_bytes = f.read()
        with open(our_f, "rb") as f:
            our_bytes = f.read()
        if ref_bytes != our_bytes:
            # short diff context
            import itertools
            for k, (a, b) in enumerate(itertools.zip_longest(
                    ref_bytes.splitlines(), our_bytes.splitlines())):
                if a != b:
                    raise AssertionError(
                        f"{ext} differs at line {k}:\n ref: {a!r}\n ours: {b!r}")
            raise AssertionError(f"{ext} differs (lengths "
                                 f"{len(ref_bytes)} vs {len(our_bytes)})")


PARAM_SETS = [
    ["-e", "10", "-m", "1.3", "-p", "2000", "-l", "4000", "-f", "300",
     "-v", "200"],
    ["-e", "10", "-p", "2000", "-l", "9000", "-r", "100"],
    ["-e", "5", "-m", "2.0", "-p", "1000", "-l", "3000", "-f", "0",
     "-v", "0"],
]


def _engines():
    return ["oracle", "jax"]


@pytest.mark.parametrize("io", ["python", "native"])
@pytest.mark.parametrize("engine", _engines())
@pytest.mark.parametrize("mode", [
    dict(),
    dict(simulated=True),
    dict(symmetric=True),
    dict(simulated=True, symmetric=True),
    dict(gz=True),
    dict(fastq=True),
    dict(multiline=True),
])
def test_parity_modes(tmp_path, ref_binary, engine, mode, io):
    tmp = str(tmp_path)
    import zlib
    seed = zlib.crc32(str(sorted(mode.items())).encode()) % 10000
    reads, paf = datagen.standard_case(seed=seed, tmpdir=tmp, **mode)
    args = PARAM_SETS[0]
    ref_prefix = f"{tmp}/ref"
    our_prefix = f"{tmp}/ours"
    run_reference(ref_binary, args + ["-o", ref_prefix, reads, paf], tmp)
    run_ours(args + ["-o", our_prefix, reads, paf], engine=engine, io=io)
    assert_parity(tmp, ref_prefix, our_prefix)


@pytest.mark.parametrize("engine", _engines())
@pytest.mark.parametrize("pidx", range(len(PARAM_SETS)))
def test_parity_param_sets(tmp_path, ref_binary, engine, pidx):
    tmp = str(tmp_path)
    reads, paf = datagen.standard_case(seed=777 + pidx, tmpdir=tmp,
                                       simulated=(pidx % 2 == 0))
    args = PARAM_SETS[pidx]
    ref_prefix = f"{tmp}/ref"
    our_prefix = f"{tmp}/ours"
    run_reference(ref_binary, args + ["-o", ref_prefix, reads, paf], tmp)
    run_ours(args + ["-o", our_prefix, reads, paf], engine=engine)
    assert_parity(tmp, ref_prefix, our_prefix)


@pytest.mark.parametrize("engine", _engines())
def test_parity_edge_reads(tmp_path, ref_binary, engine):
    """Short reads, exact multiples, zero-length matches, self-overlaps,
    repeats at read ends."""
    import random
    tmp = str(tmp_path)
    rng = random.Random(4242)
    reads = [
        ("empty", ""),                              # zero-length record
        ("tiny", "ACGT" * 25),                      # 100 bp < interval
        ("exact_iv", datagen._seq(rng, 4000)),      # == 2 intervals exactly
        ("exact_reso", datagen._seq(rng, 2500)),    # multiple of reso
        ("plain", datagen._seq(rng, 9000)),
        ("endrep", datagen._seq(rng, 12000)),       # repeat at the end
        ("allrep", datagen._seq(rng, 8000)),        # fully repetitive
        ("lonely", datagen._seq(rng, 7000)),        # zero overlaps
    ]
    lines = []
    lines += datagen.make_paf(rng, reads, 25, include_self=True,
                              repeat_spec=[(5, 8000, 12000, 40),
                                           (6, 0, 8000, 40)])
    # zero-length match at a window boundary and off-boundary
    lines.append(f"plain\t9000\t200\t200\t+\texact_iv\t4000\t100\t700\t0\t600")
    lines.append(f"plain\t9000\t333\t333\t+\texact_iv\t4000\t100\t700\t0\t600")
    # short line (skipped by parser)
    lines.append("garbage\t123\t4")
    # self overlap
    lines.append("plain\t9000\t100\t4000\t+\tplain\t9000\t5000\t8900\t3000\t3900")
    reads_path = f"{tmp}/reads.fasta"
    paf_path = f"{tmp}/overlaps.paf"
    datagen.write_fasta(reads_path, reads)
    datagen.write_paf(paf_path, lines)

    args = ["-e", "10", "-m", "1.3", "-p", "2000", "-l", "4000", "-f", "300",
            "-v", "200"]
    ref_prefix = f"{tmp}/ref"
    our_prefix = f"{tmp}/ours"
    run_reference(ref_binary, args + ["-o", ref_prefix, reads_path, paf_path],
                  tmp)
    run_ours(args + ["-o", our_prefix, reads_path, paf_path], engine=engine)
    assert_parity(tmp, ref_prefix, our_prefix)
