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
