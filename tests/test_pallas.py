"""Pallas pileup kernel vs the scatter path and the scalar oracle
(interpreter mode — runs on the CPU test mesh; the compiled kernel runs
on real TPU via ``--engine jax --pallas`` / bench)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from raft_tpu import bucketing
from raft_tpu.engine_jax import derive_cfg, pileup_diff_scatter
from raft_tpu.ops import oracle
from raft_tpu.ops.pileup_pallas import pileup_pallas
from raft_tpu.params import AlgoParams


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("n_reads,max_len", [(16, 8000), (130, 20000)])
def test_pallas_multiblock(seed, n_reads, max_len):
    """Force n_blocks > 1 (the clamped-trailing-block regression) with a
    dense event set on a 2+-tile batch."""
    rng = np.random.default_rng(900 + seed)
    params = AlgoParams(est_cov=10, reso=50)
    B, W, E = 256, 128, 4096
    cfg = derive_cfg(B, W, E, params)
    rows = np.sort(rng.integers(0, B, E)).astype(np.int32)
    w0 = rng.integers(0, W, E).astype(np.int32)
    w1 = (w0 + rng.integers(0, W - 1, E)).clip(max=W - 1).astype(np.int32)
    want, _ = pileup_diff_scatter(jnp.asarray(rows), jnp.asarray(w0),
                                  jnp.asarray(w1), cfg)
    got = pileup_pallas(jnp.asarray(rows), jnp.asarray(w0),
                        jnp.asarray(w1), cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("n_reads,max_len", [(16, 8000), (130, 20000)])
def test_pallas_matches_scatter(seed, n_reads, max_len):
    rng = np.random.default_rng(seed)
    params = AlgoParams(est_cov=10, reso=50)
    lens = rng.integers(1, max_len, n_reads).astype(np.int32)
    ev_read, ev_lo, ev_hi = [], [], []
    for r in range(n_reads):
        for _ in range(int(rng.integers(0, 40))):
            a = int(rng.integers(0, lens[r]))
            b = int(rng.integers(a, lens[r] + 1))
            ev_read.append(r)
            ev_lo.append(a)
            ev_hi.append(b - 1)
    ev_read = np.asarray(ev_read, dtype=np.int32)
    order = np.argsort(ev_read, kind="stable")
    ev_read = ev_read[order]
    ev_lo = np.asarray(ev_lo, dtype=np.int32)[order]
    ev_hi = np.asarray(ev_hi, dtype=np.int32)[order]

    for bk in bucketing.make_buckets(lens, ev_read, ev_lo, ev_hi,
                                     params.reso):
        cfg = derive_cfg(bk.B, bk.W, bk.E, params)
        want, _ = pileup_diff_scatter(jnp.asarray(bk.ev_row),
                                      jnp.asarray(bk.ev_w0),
                                      jnp.asarray(bk.ev_w1), cfg)
        if bk.B % min(128, bk.B) or bk.W % 128:
            continue  # pallas constraint; scatter path covers these
        got = pileup_pallas(jnp.asarray(bk.ev_row), jnp.asarray(bk.ev_w0),
                            jnp.asarray(bk.ev_w1), cfg, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"bucket W={bk.W}")


@pytest.mark.parametrize("seed", range(2))
def test_pallas_host_wrapper_path(seed):
    """The round-3 host-side wrapper: tile edges sliced from ev_off and
    buckets pre-quantized to the EB event-block quantum (no device
    pad/concat) must match the scatter path exactly."""
    from raft_tpu.ops.pileup_pallas import EB

    rng = np.random.default_rng(300 + seed)
    params = AlgoParams(est_cov=10, reso=50)
    n_reads = 300   # B lands on 384 (1.5*256), a multiple of the 128 tile
    lens = rng.integers(1, 20000, n_reads).astype(np.int32)
    ev_read, ev_lo, ev_hi = [], [], []
    for r in range(n_reads):
        for _ in range(int(rng.integers(0, 40))):
            a = int(rng.integers(0, lens[r]))
            b = int(rng.integers(a, lens[r] + 1))
            ev_read.append(r)
            ev_lo.append(a)
            ev_hi.append(b - 1)
    ev_read = np.asarray(ev_read, dtype=np.int32)
    order = np.argsort(ev_read, kind="stable")
    ev_read = ev_read[order]
    ev_lo = np.asarray(ev_lo, dtype=np.int32)[order]
    ev_hi = np.asarray(ev_hi, dtype=np.int32)[order]

    seen_quantized = False
    for bk in bucketing.make_buckets(lens, ev_read, ev_lo, ev_hi,
                                     params.reso, e_quantum=EB):
        assert bk.E % EB == 0
        cfg = derive_cfg(bk.B, bk.W, bk.E, params)
        want, _ = pileup_diff_scatter(jnp.asarray(bk.ev_row),
                                      jnp.asarray(bk.ev_w0),
                                      jnp.asarray(bk.ev_w1), cfg)
        if bk.B % min(128, bk.B) or bk.W % 128:
            continue
        seen_quantized = True
        got = pileup_pallas(jnp.asarray(bk.ev_row), jnp.asarray(bk.ev_w0),
                            jnp.asarray(bk.ev_w1), cfg,
                            ev_off=jnp.asarray(bk.ev_off), interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"bucket W={bk.W}")
    assert seen_quantized
