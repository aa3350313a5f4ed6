"""CLI flag-surface parity: the getopt quirks (SURVEY.md §5) and the
stdout INFO-line format, checked against the reference binary."""

from __future__ import annotations

import io
import os
import re
import subprocess
import sys

import pytest

import datagen


def _case(tmp_path):
    return datagen.standard_case(seed=31337, tmpdir=str(tmp_path),
                                 n_reads=12, len_lo=500, len_hi=9000,
                                 n_pairs=40)


def run_ref(ref_binary, args, cwd):
    return subprocess.run([ref_binary] + args, cwd=cwd,
                          capture_output=True, text=True, timeout=120)


def run_ours(args, cwd):
    from raft_tpu import cli
    old = os.getcwd()
    os.chdir(cwd)
    buf = io.StringIO()
    try:
        stdout_old = sys.stdout
        sys.stdout = buf
        try:
            rc = cli.main(args + ["--engine", "oracle"])
        except SystemExit as e:
            rc = e.code
        finally:
            sys.stdout = stdout_old
    finally:
        os.chdir(old)
    return rc, buf.getvalue()


def test_v_fallthrough_sets_prefix(tmp_path, ref_binary):
    """-v NUM also sets the output prefix (missing break, main.cpp:51-55)."""
    reads, paf = _case(tmp_path)
    args = ["-e", "10", "-p", "2000", "-l", "4000", "-v", "250", reads, paf]
    r = run_ref(ref_binary, args, str(tmp_path))
    assert r.returncode == 0
    assert os.path.exists(tmp_path / "250.reads.fasta")
    rc, _ = run_ours(args, str(tmp_path))
    assert rc == 0
    ours = (tmp_path / "250.reads.fasta").read_bytes()
    # re-run reference to its own prefix for comparison? identical prefix:
    # both wrote the same file name — compare with a fresh reference run
    r = run_ref(ref_binary, args[:-2] + ["-o", "refpfx", reads, paf],
                str(tmp_path))
    ref = (tmp_path / "refpfx.reads.fasta").read_bytes()
    assert ours == ref


def test_i_flag_exits_with_help(tmp_path, ref_binary):
    reads, paf = _case(tmp_path)
    args = ["-e", "10", "-i", "5000", reads, paf]
    r = run_ref(ref_binary, args, str(tmp_path))
    assert r.returncode == 1
    assert r.stdout.startswith("Usage: raft")
    rc, out = run_ours(args, str(tmp_path))
    assert rc == 1
    assert out.startswith("Usage: raft")


def test_missing_est_cov_errors(tmp_path, ref_binary):
    reads, paf = _case(tmp_path)
    args = [reads, paf]
    r = run_ref(ref_binary, args, str(tmp_path))
    assert r.returncode == 1
    rc, out = run_ours(args, str(tmp_path))
    assert rc == 1
    assert ("estimated coverage must be set properly" in out
            and "estimated coverage must be set properly" in r.stdout)


def test_missing_positionals_help(tmp_path, ref_binary):
    r = run_ref(ref_binary, ["-e", "10"], str(tmp_path))
    assert r.returncode == 1 and r.stdout.startswith("Usage")
    rc, out = run_ours(["-e", "10"], str(tmp_path))
    assert rc == 1 and out.startswith("Usage")


def test_missing_input_file_error(tmp_path, ref_binary):
    reads, paf = _case(tmp_path)
    args = ["-e", "10", "-o", "x", "nonexistent.fa", paf]
    r = run_ref(ref_binary, args, str(tmp_path))
    assert r.returncode == 1
    rc, out = run_ours(args, str(tmp_path))
    assert rc == 1
    assert "does not exist or is empty" in out
    assert "does not exist or is empty" in r.stdout


def test_stdout_info_lines_match(tmp_path, ref_binary):
    """All INFO/stat lines match the reference byte-for-byte, except the
    timing value and the CMD echo (binary path differs)."""
    reads, paf = _case(tmp_path)
    args = ["-e", "10", "-m", "1.3", "-p", "2000", "-l", "4000",
            "-o", "lg", reads, paf]
    r = run_ref(ref_binary, args, str(tmp_path))
    assert r.returncode == 0
    rc, out = run_ours(args, str(tmp_path))
    assert rc == 0

    def norm(text):
        lines = []
        for ln in text.splitlines():
            if ln.startswith("INFO, main(), program completed"):
                ln = "INFO, main(), program completed after X seconds"
            if ln.startswith("INFO, main(), CMD:"):
                ln = "CMD"
            lines.append(ln)
        return lines

    assert norm(r.stdout) == norm(out)


def test_atoi_semantics(tmp_path, ref_binary):
    """C atoi: '50x' parses as 50; both runs must agree byte-for-byte."""
    reads, paf = _case(tmp_path)
    args = ["-e", "10", "-r", "75x", "-p", "2000", "-l", "4000"]
    r = run_ref(ref_binary, args + ["-o", "ra", reads, paf], str(tmp_path))
    assert r.returncode == 0
    rc, _ = run_ours(args + ["-o", "oa", reads, paf], str(tmp_path))
    assert rc == 0
    assert ((tmp_path / "ra.coverage.txt").read_bytes()
            == (tmp_path / "oa.coverage.txt").read_bytes())


def test_split_naive_parity(tmp_path, ref_split_naive):
    reads, _ = _case(tmp_path)
    ref_out = str(tmp_path / "ref_split.fasta")
    our_out = str(tmp_path / "our_split.fasta")
    r = subprocess.run([ref_split_naive, reads, ref_out, "3000"],
                       capture_output=True, timeout=60)
    assert r.returncode == 0
    from raft_tpu.tools.split_naive import split_naive
    split_naive(reads, our_out, 3000)
    with open(ref_out, "rb") as f:
        a = f.read()
    with open(our_out, "rb") as f:
        b = f.read()
    assert a == b


def test_stats_json_and_chunked_cli(tmp_path):
    import json
    reads, paf = _case(tmp_path)
    args = ["-e", "10", "-p", "2000", "-l", "4000",
            "-o", str(tmp_path / "sj"), "--engine", "jax",
            "--stats-json", str(tmp_path / "stats.json"),
            "--chunk-reads", "5", reads, paf]
    rc, _ = run_ours(args, str(tmp_path))
    assert rc == 0
    stats = json.loads((tmp_path / "stats.json").read_text())
    assert stats["n_reads"] == 12
    assert stats["n_fragments"] >= 12
    assert stats["peak_rss_mb"] > 0
    assert (tmp_path / "sj.reads.fasta").exists()


def test_cov_out_cli_modes(tmp_path):
    """--cov-out {host,diff8,cov} must produce identical outputs."""
    reads, paf = _case(tmp_path)
    outs = {}
    for mode in ("host", "diff8", "cov"):
        args = ["-e", "10", "-p", "2000", "-l", "4000",
                "-o", str(tmp_path / mode), "--engine", "jax",
                "--cov-out", mode, reads, paf]
        from raft_tpu import cli
        old = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            assert cli.main(args) == 0
        finally:
            os.chdir(old)
        outs[mode] = (tmp_path / f"{mode}.coverage.txt").read_bytes()
        assert (tmp_path / f"{mode}.reads.fasta").exists()
    assert outs["host"] == outs["diff8"] == outs["cov"]


def test_overlap_greater_than_interval_rejected(tmp_path):
    """-v > -p is reference UB (chop.hpp:318 substr underflow crashes it
    on any fragmented read; PARITY.md divergence 7) — we error up front
    with a message naming both flags."""
    import datagen
    from raft_tpu.params import AlgoParams
    tmp = str(tmp_path)
    datagen.standard_case(seed=5, tmpdir=tmp, n_reads=5)
    with pytest.raises(ValueError, match=r"-v.*<=.*-p|overlap_length"):
        AlgoParams(est_cov=10, overlap_length=1000,
                   interval_length=500, repeat_length=500).validate()


def test_est_cov_hint_on_stderr(tmp_path, capsys):
    """The r4 est_cov advisory (EVAL.md sweep) fires on STDERR when -e
    is far from the observed coverage, stays silent when -e matches,
    and never touches stdout (reference line parity)."""
    reads, paf = _case(tmp_path)
    from raft_tpu import cli
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        # -e 1: observed coverage/window >> 1 -> under-estimate hint
        assert cli.main(["-e", "1", "-p", "2000", "-l", "4000",
                         "-o", "h1", reads, paf]) == 0
        cap = capsys.readouterr()
        assert "UNDER-estimated" in cap.err
        assert "HINT" not in cap.out

        # -e 1000: ratio ~0 -> over-estimate hint
        assert cli.main(["-e", "1000", "-p", "2000", "-l", "4000",
                         "-o", "h2", reads, paf]) == 0
        cap = capsys.readouterr()
        assert "over-estimate" in cap.err
        assert "HINT" not in cap.out

        # RAFT_NO_HINTS silences it
        os.environ["RAFT_NO_HINTS"] = "1"
        try:
            assert cli.main(["-e", "1", "-p", "2000", "-l", "4000",
                             "-o", "h3", reads, paf]) == 0
            cap = capsys.readouterr()
            assert "HINT" not in cap.err
        finally:
            del os.environ["RAFT_NO_HINTS"]
    finally:
        os.chdir(cwd)
