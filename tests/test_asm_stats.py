"""asm_stats: the always-available contiguity metric behind
scripts/eval_assembly.sh (N50/L50 + NG50/LG50)."""

from __future__ import annotations

import gzip
import json
import subprocess
import sys

from raft_tpu.tools.asm_stats import contig_lengths, nx


def test_nx_math():
    lens = [20, 10, 4]                      # total 34
    assert nx(lens, 34) == (20, 1)          # N50: 17 target
    assert nx(lens, 32) == (20, 1)          # NG50 vs 32 bp genome
    assert nx(lens, 200) == (None, None)    # assembly never reaches half
    assert nx([7], 14) == (7, 1)            # exact-half boundary counts


def test_contig_lengths_plain_and_gz(tmp_path):
    fa = b">a\nACGT\nAC\n>b\n\n>c\nACGTACGT\n"
    p = tmp_path / "x.fa"
    p.write_bytes(fa)
    assert contig_lengths(str(p)) == [6, 0, 8]
    pz = tmp_path / "x.fa.gz"
    pz.write_bytes(gzip.compress(fa))
    assert contig_lengths(str(pz)) == [6, 0, 8]


def test_cli_json(tmp_path):
    asm = tmp_path / "asm.fa"
    asm.write_text(">c1\nACGTACGTAC\n>c2\nACGT\n>c3\n" + "A" * 20 + "\n")
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr\n" + "C" * 32 + "\n")
    res = subprocess.run(
        [sys.executable, "-m", "raft_tpu.tools.asm_stats", str(asm),
         "-r", str(ref)], capture_output=True, text=True)
    assert res.returncode == 0
    j = json.loads(res.stdout)
    assert j == {"contigs": 3, "total_bp": 34, "largest_bp": 20,
                 "n50": 20, "l50": 1, "genome_size": 32, "ng50": 20,
                 "lg50": 1, "ng50_reached": True}


def test_eval_assembly_harness_runs_asm_stats(tmp_path):
    """The harness exits 0 with asm_stats ran (and externals skipped)
    even in a tool-free image — but still never reports silent success:
    a missing assembly file makes asm_stats FAIL and the exit code 2."""
    asm = tmp_path / "asm.fa"
    asm.write_text(">c\nACGTACGT\n")
    ref = tmp_path / "ref.fa"
    ref.write_text(">r\nACGTACGTACGT\n")
    res = subprocess.run(
        ["bash", "/root/repo/scripts/eval_assembly.sh", str(asm),
         str(ref)], capture_output=True, text=True, cwd=tmp_path)
    assert res.returncode == 0, res.stderr
    j = json.loads(res.stdout.strip().splitlines()[-1])
    assert j["asm_stats"] == "ran" and j["ran"] >= 1
    assert json.loads((tmp_path / "asm_stats.json").read_text())[
        "total_bp"] == 8
    res2 = subprocess.run(
        ["bash", "/root/repo/scripts/eval_assembly.sh",
         str(tmp_path / "missing.fa"), str(ref)],
        capture_output=True, text=True, cwd=tmp_path)
    assert res2.returncode == 2
