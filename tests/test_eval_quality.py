"""Ground-truth quality regression at chr11-2M workflow scale (EVAL.md).

Slow: full 2 Mbp / 30x simulate + pipeline + scoring (~1 min on CPU).
Thresholds sit below the measured values (EVAL.md) so algorithmic
regressions fail loudly while seed/noise wiggle passes.
"""

from __future__ import annotations

import pytest

from raft_tpu.tools.eval_repeats import run_eval


@pytest.mark.slow
def test_quality_at_2m_scale(tmp_path):
    out = run_eval(str(tmp_path), genome_size=2_000_000, coverage=30.0,
                   verbose=False)
    assert out["bed_recall"] >= 0.95, out
    assert out["bed_precision_flank_tolerant"] >= 0.95, out
    assert out["genome_fraction_covered_by_fragments"] >= 0.99, out
    # the product invariant: repeat-aware cuts avoid true repeats far
    # better than the position-blind ablation
    assert out["cut_in_repeat_rate"] <= 0.06, out
    assert (out["cut_in_repeat_rate"]
            <= 0.6 * out["naive_cut_in_repeat_rate"]), out
    assert out["n_fragments"] > out["n_reads"], out


@pytest.mark.slow
def test_est_cov_sensitivity_shape(tmp_path):
    """The est_cov mis-specification failure mode (EVAL.md round-4
    sweep) must keep its qualitative shape: under-estimating -e
    collapses precision and suppresses fragmentation; >=1x is stable."""
    from raft_tpu.tools.eval_repeats import run_sweep

    rows = run_sweep(str(tmp_path), genome_size=2_000_000, coverage=30.0,
                     seeds=(11,), scales=(0.5, 1.0, 2.0), verbose=False)
    by_scale = {r["est_cov_scale"]: r for r in rows}
    lo, mid, hi = by_scale[0.5], by_scale[1.0], by_scale[2.0]
    # under-estimate: precision collapse + under-fragmentation
    assert lo["bed_precision_flank_tolerant"] <= 0.5, lo
    assert lo["n_fragments"] <= 0.9 * mid["n_fragments"], (lo, mid)
    assert lo["fraction_repeat_stat"] >= 3 * mid["fraction_repeat_stat"]
    # correct and over-estimate: healthy on this genome size
    for r in (mid, hi):
        assert r["bed_recall"] >= 0.95, r
        assert r["bed_precision_flank_tolerant"] >= 0.95, r
    assert abs(hi["n_fragments"] - mid["n_fragments"]) \
        <= 0.02 * mid["n_fragments"], (mid, hi)


@pytest.mark.slow
def test_auto_e_quality(tmp_path):
    """--auto-e must match central-point quality with NO user-supplied
    -e (EVAL.md r5: auto estimate 34-35 on 30x inputs lands in the
    measured-safe [1.1x, 1.5x] band)."""
    out = run_eval(str(tmp_path), genome_size=2_000_000, coverage=30.0,
                   verbose=False, auto_e=True)
    assert 31 <= out["est_cov_used"] <= 45, out  # 1.05x-1.5x of true 30
    assert out["bed_recall"] >= 0.95, out
    assert out["bed_precision_flank_tolerant"] >= 0.95, out
    assert out["cut_in_repeat_rate"] <= 0.06, out
    assert out["n_fragments"] > out["n_reads"], out


@pytest.mark.slow
def test_noisy_overlaps_quality(tmp_path):
    """Robustness at a realistic noisy operating point (EVAL.md r5
    noise sweep): 20% true overlaps dropped + 10% spurious pairs +
    100 bp endpoint jitter must not break detection at 2 Mbp/30x."""
    out = run_eval(str(tmp_path), genome_size=2_000_000, coverage=30.0,
                   verbose=False, drop_rate=0.2, spurious_rate=0.1,
                   jitter_sd=100.0)
    assert out["bed_recall"] >= 0.95, out
    assert out["bed_precision_flank_tolerant"] >= 0.90, out
    assert out["cut_in_repeat_rate"] <= 0.08, out
    assert out["n_fragments"] > out["n_reads"], out


def test_noise_free_sim_bit_identical(tmp_path):
    """Noise knobs at 0 must leave the simulator's output bit-identical
    (separate rng stream; fixture stability across rounds)."""
    from raft_tpu.tools.simulate import write_simulation
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_simulation(a, 150_000, 8.0, 2, 4000, 3, seed=5)
    write_simulation(b, 150_000, 8.0, 2, 4000, 3, seed=5,
                     drop_rate=0.0, spurious_rate=0.0, jitter_sd=0.0)
    for ext in (".reads.fasta", ".overlaps.paf", ".truth_repeats.bed"):
        assert open(a + ext, "rb").read() == open(b + ext, "rb").read()


def test_interval_algebra():
    """Unit: merge/intersect/points_in on hand-checked cases."""
    import numpy as np
    from raft_tpu.tools import eval_repeats as ev

    iv = np.asarray([[5, 10], [0, 3], [9, 12], [20, 30]])
    m = ev.merge_intervals(iv)
    assert m.tolist() == [[0, 3], [5, 12], [20, 30]]
    assert ev.total_len(m) == 3 + 7 + 10
    other = np.asarray([[2, 6], [25, 40]])
    assert ev.intersect_len(m, ev.merge_intervals(other)) == (1 + 1 + 5)
    pts = np.asarray([0, 2, 3, 4, 11, 12, 29, 30])
    got = ev.points_in(pts, m)
    assert got.tolist() == [True, True, False, False, True, False, True,
                            False]
    assert ev.n50(np.asarray([1, 1, 1, 97])) == 97
    assert ev.n50(np.asarray([10, 10, 10, 10])) == 10


@pytest.mark.slow
def test_asm_proxy_contiguity(tmp_path):
    """Under the idealized OLC-uniqueness layout (EVAL.md r5), RAFT
    fragments must assemble substantially more contiguously than the
    position-blind tiling of the same reads."""
    import os
    import re

    import numpy as np

    from raft_tpu.params import AlgoParams
    from raft_tpu.pipeline import run_pipeline
    from raft_tpu.tools import asm_proxy
    from raft_tpu.tools.simulate import write_simulation

    wd = str(tmp_path)
    prefix = os.path.join(wd, "sim")
    info = write_simulation(prefix, 2_000_000, 30.0, 3, 15000, 4, seed=11)
    params = AlgoParams(est_cov=info["est_cov"],
                        outputfilename=os.path.join(wd, "out"))
    run_pipeline(prefix + ".reads.fasta", prefix + ".overlaps.paf",
                 params, verbose=False)
    raft = asm_proxy.evaluate(os.path.join(wd, "out.reads.fasta"),
                              prefix + ".truth_repeats.bed")

    hdr = re.compile(
        rb">read=\d+,(forward|reverse),position=(\d+)-(\d+),length=\d+,")
    iv = []
    L = params.read_length
    for line in open(prefix + ".reads.fasta", "rb"):
        if line.startswith(b">"):
            m = hdr.match(line)
            al, a, b = m.group(1), int(m.group(2)), int(m.group(3))
            cuts = list(range(0, b - a, L)) + [b - a]
            for j in range(len(cuts) - 1):
                lo, hi = cuts[j], cuts[j + 1]
                iv.append((a + lo, a + hi) if al == b"forward"
                          else (b - hi, b - lo))
    naive = np.asarray(iv, dtype=np.int64)
    reps = asm_proxy.read_bed(prefix + ".truth_repeats.bed")
    merged = [list(reps[0])]
    for s, e in reps[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    c, amb, _ = asm_proxy.assemble(naive,
                                   np.asarray(merged, dtype=np.int64), 500)
    span = int(naive[:, 1].max() - naive[:, 0].min())
    naive_ng50 = asm_proxy.ng50(c, span)

    assert raft["ng50"] >= 1.5 * naive_ng50, (raft, naive_ng50)
    assert raft["ambiguous_junction_breaks"] < amb, (raft, amb)
